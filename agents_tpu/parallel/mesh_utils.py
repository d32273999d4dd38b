"""Device mesh construction and data-parallel sharding rules.

The reference scales via ``tf.distribute`` strategies
(train/utils/strategy_utils.py:27-61, Learner reduce at
train/learner.py:322-338). Here the same data parallelism is expressed the
scaling-book way: build a `jax.sharding.Mesh` with a `data` axis, annotate
the leading env/batch dimension of the training state with
`NamedSharding(P('data'))`, keep parameters replicated, and let the SPMD
partitioner insert the gradient all-reduces over ICI.

The FusedTrainLoop needs no code changes to scale: `shard_loop_state`
places its state pytree, and `jax.jit(loop.iteration)` compiles to a
multi-chip program.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(num_devices: Optional[int] = None,
                axis_name: str = "data") -> Mesh:
  """1-D data-parallel mesh (the reference's only intra-model parallelism;
  SURVEY.md §2.10)."""
  devices = jax.devices()
  if num_devices is not None:
    devices = devices[:num_devices]
  return Mesh(np.array(devices), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, batch_axis: int = 0,
                  axis_name: str = "data") -> NamedSharding:
  spec = [None] * (batch_axis + 1)
  spec[batch_axis] = axis_name
  return NamedSharding(mesh, P(*spec))


def shard_loop_state(loop_state, mesh: Mesh, batch_size: int,
                     replay_capacity: Optional[int] = None,
                     axis_name: str = "data"):
  """Place a FusedTrainLoop LoopState on the mesh.

  Rules:
    - leaves with leading dim == batch_size  -> P('data', ...)
    - replay storage leaves [capacity, B, ...] -> P(None, 'data', ...)
    - everything else (params, opt state, counters, deques) -> replicated
  """
  rep = replicated(mesh)
  s_b0 = NamedSharding(mesh, P(axis_name))
  s_b1 = NamedSharding(mesh, P(None, axis_name))

  def _top(path):
    if not path:
      return ""
    k = path[0]
    return getattr(k, "name", getattr(k, "key", str(k)))

  def place(path, x):
    # Placement keys on the LoopState FIELD first, shape second: pure
    # shape matching mis-shards whenever dims collide (replay storage
    # with capacity == batch_size would get P('data') on the CAPACITY
    # axis; an agent-state matrix with dim0 == batch_size would be
    # split instead of replicated) — correct-but-slow under GSPMD, with
    # full reshards every iteration.
    top = _top(path)
    shape = jnp.shape(x)
    if top == "agent_state":
      return jax.device_put(x, rep)  # params/opt state replicate (DP)
    if top == "replay_state":
      if len(shape) >= 2 and shape[1] == batch_size and (
          replay_capacity is None or shape[0] == replay_capacity):
        return jax.device_put(x, s_b1)   # storage [capacity, B, ...]
      if len(shape) >= 1 and shape[0] == batch_size:
        return jax.device_put(x, s_b0)   # per-row cursors/ids
      return jax.device_put(x, rep)
    if len(shape) >= 1 and shape[0] == batch_size:
      return jax.device_put(x, s_b0)     # driver/metric per-row state
    if (replay_capacity is not None and len(shape) >= 2
        and shape[0] == replay_capacity and shape[1] == batch_size):
      return jax.device_put(x, s_b1)
    return jax.device_put(x, rep)

  return jax.tree_util.tree_map_with_path(place, loop_state)
