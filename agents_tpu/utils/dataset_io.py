"""Offline trajectory dataset IO.

Analogue of ``tf_agents/utils/example_encoding.py`` +
``example_encoding_dataset.py`` (TFRecordObserver :81 /
load_tfrecord_dataset :174) and the RLDS ingestion path
(``replay_buffers/rlds_to_reverb.py``): trajectory frames are written as
sharded ``.npz`` files with a JSON spec manifest, then streamed back into
the on-device replay for offline training (CQL/BC).
"""
from __future__ import annotations

import glob
import json
import os
from typing import Any, Iterator, Optional

import jax
import numpy as np

from agents_tpu.policies.policy_saver import _spec_to_json
from agents_tpu.specs import array_spec


class TrajectoryFileObserver:
  """Driver observer that shards trajectory frames to disk
  (TFRecordObserver analogue)."""

  def __init__(self, path: str, data_spec, frames_per_shard: int = 4096):
    self.path = os.path.abspath(path)
    os.makedirs(self.path, exist_ok=True)
    self.data_spec = data_spec
    self.frames_per_shard = frames_per_shard
    self._buffer = []
    self._shard = 0
    leaf_specs = jax.tree_util.tree_leaves(
        data_spec, is_leaf=lambda s: isinstance(s, array_spec.ArraySpec))
    with open(os.path.join(self.path, "spec.json"), "w") as f:
      json.dump([_spec_to_json(s) for s in leaf_specs], f)

  def __call__(self, traj):
    self._buffer.append(jax.tree_util.tree_map(np.asarray, traj))
    if len(self._buffer) >= self.frames_per_shard:
      self.flush()

  def flush(self):
    if not self._buffer:
      return
    stacked = jax.tree_util.tree_map(
        lambda *xs: np.stack(xs), *self._buffer)
    leaves, _ = jax.tree_util.tree_flatten(stacked)
    np.savez_compressed(
        os.path.join(self.path, f"shard_{self._shard:05d}.npz"),
        **{f"leaf_{i}": l for i, l in enumerate(leaves)})
    self._shard += 1
    self._buffer = []


def load_trajectory_dataset(path: str, template) -> Iterator[Any]:
  """Yields per-shard nests matching `template`'s treedef
  (load_tfrecord_dataset analogue)."""
  treedef = jax.tree_util.tree_structure(template)
  for shard in sorted(glob.glob(os.path.join(path, "shard_*.npz"))):
    with np.load(shard) as data:
      leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
    yield jax.tree_util.tree_unflatten(treedef, leaves)


def dataset_num_frames(path: str) -> int:
  """Total frames (per replay row) across shards. Consumers sizing a
  replay ring must use THIS, not a config value: if the ring is smaller
  than the dataset actually on disk, `dataset_to_replay`'s ring writes
  silently wrap and drop the oldest data.

  Reads only the .npy header inside each zip member — no decompression
  of the (possibly multi-MB) leaf payloads."""
  import zipfile

  total = 0
  for shard in sorted(glob.glob(os.path.join(path, "shard_*.npz"))):
    with zipfile.ZipFile(shard) as zf:
      with zf.open("leaf_0.npy") as f:
        version = np.lib.format.read_magic(f)
        if version == (1, 0):
          shape, _, _ = np.lib.format.read_array_header_1_0(f)
        else:
          shape, _, _ = np.lib.format.read_array_header_2_0(f)
    total += int(shape[0])
  return total


def dataset_to_replay(path: str, template, replay, replay_state):
  """Stream a saved dataset into an on-device UniformReplay
  (rlds_to_reverb.py analogue). Frames in each shard are [N, B?, ...];
  unbatched frames are broadcast to the replay's row count."""
  import jax.numpy as jnp

  add = jax.jit(replay.add_sequence)
  # Per-frame rank from the replay's own (unbatched) data spec — the
  # `template` may be a batched example frame, which makes leading-dim
  # inference from it ambiguous.
  spec_leaves = jax.tree_util.tree_leaves(
      replay.data_spec, is_leaf=lambda x: hasattr(x, "shape"))
  frame_rank = len(spec_leaves[0].shape)
  for shard in load_trajectory_dataset(path, template):
    leaves = jax.tree_util.tree_leaves(shard)
    n = leaves[0].shape[0]
    # Batched-ness from the per-frame template rank, not a shape
    # coincidence: leading dims are [N] (unbatched stream) or [N, B].
    lead = leaves[0].ndim - frame_rank
    if lead == 2:
      if leaves[0].shape[1] != replay.batch_size:
        raise ValueError(
            f"dataset batch size {leaves[0].shape[1]} != replay "
            f"batch_size {replay.batch_size}; re-record or rebuild the "
            "replay with matching rows")
    elif lead == 1:
      shard = jax.tree_util.tree_map(
          lambda x: np.broadcast_to(
              x[:, None], (n, replay.batch_size) + x.shape[1:]), shard)
    else:
      raise ValueError(
          f"shard leading rank {lead} unsupported (expected [N,...] or "
          "[N, B, ...])")
    replay_state = add(replay_state, shard)
  return replay_state
