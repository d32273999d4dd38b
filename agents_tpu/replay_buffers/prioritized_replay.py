"""On-HBM prioritized replay (PER), sampled by fused inverse-CDF.

TPU-native analogue of the reference's prioritized path, which it gets
from dm-reverb's C++ ``Prioritized`` selector plus
``ReverbReplayBuffer.update_priorities``
(tf_agents/replay_buffers/reverb_replay_buffer.py:436). A CPU PER uses a
sum-tree for O(log N) single-item ops; on TPU that is pointer-chasing
poison. Here priorities are a dense ``[capacity, B]`` HBM array and one
sample is:

  p = where(valid, priority**alpha, 0)        # elementwise, fused
  cdf = cumsum(p.ravel())                     # one bandwidth-bound pass
  idx = searchsorted(cdf, stratified_u)       # S binary searches

All three stages stay inside the jitted train program (no host
round-trips), and at real sizes (capacity*B ~ millions) the cumsum is a
few MB of HBM traffic — negligible next to the gradient step. Updates
are plain scatters. Schaul et al. 2015 semantics: proportional
prioritization with stratified sampling, new items enter at the running
max priority, importance weights ``(N * P(i))**-beta`` normalized by
their max.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct



def _chunked_cumsum(flat: jax.Array, chunk: int = 1024) -> jax.Array:
  """float32 inclusive cumsum with two-level accumulation.

  A single flat cumsum over capacity*B entries (millions at target sizes)
  accumulates O(N)-addition rounding error that skews the tail of the
  CDF. Summing within fixed chunks and then offsetting by a cumsum of
  per-chunk totals bounds the sequential accumulation at
  O(chunk + N/chunk) additions per element.
  """
  n = flat.shape[0]
  if n <= chunk:
    return jnp.cumsum(flat)
  pad = (-n) % chunk
  chunks = jnp.pad(flat, (0, pad)).reshape(-1, chunk)
  within = jnp.cumsum(chunks, axis=1)
  offsets = jnp.concatenate(
      [jnp.zeros((1,), flat.dtype), jnp.cumsum(within[:-1, -1])])
  return (within + offsets[:, None]).reshape(-1)[:n]


@struct.dataclass
class PrioritizedReplayState:
  storage: Any            # pytree: [capacity, B, ...]
  priorities: jax.Array   # [capacity, B] float32, raw (pre-alpha)
  count: jax.Array        # int32 scalar: total frames added
  max_priority: jax.Array  # float32 scalar: running max raw priority


class PrioritizedBufferInfo(NamedTuple):
  """Sample metadata. `probabilities` are the actual P(i) used, so agents
  can form importance weights; `is_weights` are the standard normalized
  (N*P)^-beta weights ready to pass as `weights=` to agent.train."""
  ids: jax.Array            # [S] absolute time ids
  rows: jax.Array           # [S] env-row ids
  probabilities: jax.Array  # [S]
  is_weights: jax.Array     # [S]


class PrioritizedReplay:
  """Proportional prioritized ring buffer.

  Args:
    data_spec: spec nest for one (unbatched) frame.
    batch_size: number of parallel env rows B.
    max_length: ring capacity per row.
    alpha: prioritization exponent (0 = uniform).
    epsilon: added to updated priorities so no item starves.
  """

  def __init__(self, data_spec, batch_size: int, max_length: int,
               alpha: float = 0.6, epsilon: float = 1e-6,
               pack_large_rows: bool = True,
               debug_min_size_asserts: bool = False):
    from agents_tpu.ops.replay_gather import RowPacker

    self.data_spec = data_spec
    self.batch_size = int(batch_size)
    self.capacity = int(max_length)
    self.alpha = float(alpha)
    self.epsilon = float(epsilon)
    self.pack_large_rows = bool(pack_large_rows)
    # See uniform_replay.check_min_size: Reverb-MinSize-style underfill
    # guard; the run-time variant syncs per sample, so debug only.
    self.debug_min_size_asserts = bool(debug_min_size_asserts)
    # Tile-aligned storage for multi-KB leaves: 1.79x faster sampling on
    # TPU v5e (ops/replay_gather.py docstring).
    self.packer = RowPacker(data_spec, enabled=pack_large_rows)

  # -- lifecycle -----------------------------------------------------------
  def init(self) -> PrioritizedReplayState:
    storage = self.packer.init_storage((self.capacity, self.batch_size))
    return PrioritizedReplayState(
        storage=storage,
        priorities=jnp.zeros((self.capacity, self.batch_size), jnp.float32),
        count=jnp.zeros((), jnp.int32),
        max_priority=jnp.ones((), jnp.float32))

  def clear(self, state) -> PrioritizedReplayState:
    return state.replace(count=jnp.zeros((), jnp.int32),
                         priorities=jnp.zeros_like(state.priorities),
                         max_priority=jnp.ones((), jnp.float32))

  def size(self, state):
    return jnp.minimum(state.count, self.capacity)

  # -- write ---------------------------------------------------------------
  def add_batch(self, state, items,
                priorities: Optional[jax.Array] = None):
    """Write one frame per env row (items [B, ...]). New items get the
    running max priority unless `priorities` ([B]) is given."""
    pos = state.count % self.capacity
    items = self.packer.to_stored(items, outer_ndim=1)
    storage = jax.tree_util.tree_map(
        lambda s, x: s.at[pos].set(x.astype(s.dtype)), state.storage, items)
    if priorities is None:
      new_p = jnp.full((self.batch_size,), state.max_priority, jnp.float32)
      max_p = state.max_priority
    else:
      new_p = jnp.abs(priorities).astype(jnp.float32) + self.epsilon
      max_p = jnp.maximum(state.max_priority, new_p.max())
    from agents_tpu.replay_buffers.uniform_replay import renorm_count
    return PrioritizedReplayState(
        storage=storage,
        priorities=state.priorities.at[pos].set(new_p),
        count=renorm_count(state.count + 1, self.capacity),
        max_priority=max_p)

  def add_sequence(self, state, items):
    def body(st, frame):
      return self.add_batch(st, frame), ()

    state, _ = jax.lax.scan(body, state, items)
    return state

  # -- read ----------------------------------------------------------------
  def _time_ids(self, count):
    """Most-recent absolute time id held at each ring position r:
    the largest id < count congruent to r (negative = never written)."""
    r = jnp.arange(self.capacity, dtype=jnp.int32)
    last = count - 1
    return last - ((last - r) % self.capacity)

  def sample(self, state, key, sample_batch_size: int,
             num_steps: Optional[int] = None, beta: float = 0.4,
             _normalize_is_weights: bool = True):
    """Stratified prioritized sample of windows.

    Window priority is the priority at the window's first frame. Returns
    (batch, PrioritizedBufferInfo); leaves are [S, ...] when
    `num_steps is None`, else [S, num_steps, ...].
    `_normalize_is_weights=False` returns raw ``(N * p)^-beta`` weights
    (used by `sample_sharded`, which max-normalizes globally).
    """
    n = 1 if num_steps is None else int(num_steps)
    from agents_tpu.replay_buffers.uniform_replay import check_min_size
    check_min_size(state.count, n, self.debug_min_size_asserts)
    size = self.size(state)
    t_r = self._time_ids(state.count)                       # [capacity]
    valid = ((t_r >= 0) & (t_r >= state.count - size)
             & (t_r <= state.count - n))                    # [capacity]

    ps = jnp.where(valid[:, None],
                   jnp.power(state.priorities, self.alpha), 0.0)
    flat = ps.reshape(-1)                                   # [capacity*B]
    cdf = _chunked_cumsum(flat)
    total = jnp.maximum(cdf[-1], 1e-30)

    # Stratified: one uniform per equal-mass stratum (Schaul '15 §B.2.1).
    # Clamp strictly below `total`: float32 rounding in the last stratum
    # can otherwise produce u == total, whose searchsorted index lands one
    # past the last positive-mass item (a never-written zero-priority
    # slot) and poisons the IS-weight normalization.
    u = (jnp.arange(sample_batch_size, dtype=jnp.float32)
         + jax.random.uniform(key, (sample_batch_size,))) \
        / sample_batch_size * total
    u = jnp.minimum(u, total * (1.0 - 1e-7))
    idx = jnp.searchsorted(cdf, u, side="right").astype(jnp.int32)
    idx = jnp.minimum(idx, self.capacity * self.batch_size - 1)

    pos = idx // self.batch_size
    rows = idx % self.batch_size
    t0 = t_r[pos]

    probs = flat[idx] / total
    n_valid = jnp.maximum(valid.sum() * self.batch_size, 1).astype(
        jnp.float32)
    # Belt-and-braces: a zero-probability sample (only reachable through
    # float32 CDF pathologies) must not dominate the max-normalization.
    w = jnp.where(probs > 0,
                  jnp.power(n_valid * jnp.maximum(probs, 1e-30),
                            -float(beta)), 0.0)
    if _normalize_is_weights:
      w = w / jnp.maximum(w.max(), 1e-30)

    batch = self._gather(state.storage, t0, rows, n)
    if num_steps is None:
      batch = jax.tree_util.tree_map(lambda x: x[:, 0], batch)
    return batch, PrioritizedBufferInfo(
        ids=t0, rows=rows, probabilities=probs, is_weights=w)

  def sample_sharded(self, state, key, sample_batch_size: int, mesh,
                     num_steps: Optional[int] = None, beta: float = 0.4,
                     axis_name: str = "data"):
    """Shard-local prioritized sample over a mesh-sharded buffer.

    Storage and priorities sharded P(None, '<axis>') on the env-row axis:
    each shard inverse-CDF samples S/n windows from its OWN rows' priority
    mass (the per-worker PER of distributed replay, and the sharded
    analogue of `UniformReplay.sample_sharded`) — gathers and the CDF
    stay device-local; nothing storage-sized crosses the interconnect.

    Semantics vs `sample`: shards are treated as equal-mass strata
    (probabilities scaled by 1/n). Because the raw IS weight
    ``(N_local * p_local)^-beta == (N_global * p_global)^-beta`` under
    that convention, weights stay exact; the max-normalization is global
    via a scalar `pmax` (the only collective, 4 bytes).
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    n_sh = mesh.shape[axis_name]
    if self.batch_size % n_sh or sample_batch_size % n_sh:
      raise ValueError(
          f"batch_size {self.batch_size} and sample_batch_size "
          f"{sample_batch_size} must both be divisible by the "
          f"'{axis_name}' axis size {n_sh}")
    b_local = self.batch_size // n_sh
    local_rb = PrioritizedReplay(
        self.data_spec, b_local, self.capacity, alpha=self.alpha,
        epsilon=self.epsilon, pack_large_rows=self.pack_large_rows,
        debug_min_size_asserts=self.debug_min_size_asserts)

    def local_sample(storage, priorities, count, max_p, k):
      i = jax.lax.axis_index(axis_name)
      st = PrioritizedReplayState(storage=storage, priorities=priorities,
                                  count=count[0], max_priority=max_p[0])
      batch, info = local_rb.sample(
          st, jax.random.fold_in(k[0], i), sample_batch_size // n_sh,
          num_steps, beta, _normalize_is_weights=False)
      gmax = jax.lax.pmax(jnp.max(info.is_weights), axis_name)
      info = PrioritizedBufferInfo(
          ids=info.ids, rows=info.rows + i * b_local,
          probabilities=info.probabilities / n_sh,
          is_weights=info.is_weights / jnp.maximum(gmax, 1e-30))
      return batch, info

    storage_specs = jax.tree_util.tree_map(lambda _: P(None, axis_name),
                                           state.storage)
    out_specs = (jax.tree_util.tree_map(lambda _: P(axis_name),
                                        state.storage),
                 PrioritizedBufferInfo(ids=P(axis_name), rows=P(axis_name),
                                       probabilities=P(axis_name),
                                       is_weights=P(axis_name)))
    # count/max_priority/key ride a size-1 leading axis so shard_map can
    # replicate them without rep-checking custom PRNG types.
    return shard_map(
        local_sample, mesh=mesh,
        in_specs=(storage_specs, P(None, axis_name), P(), P(), P()),
        out_specs=out_specs, check_rep=False)(
            state.storage, state.priorities, state.count[None],
            state.max_priority[None], key[None])

  def _gather(self, storage, t0, rows, n):
    from agents_tpu.ops.replay_gather import gather_rows

    t_idx = (t0[:, None] + jnp.arange(n)[None, :]) % self.capacity
    flat_idx = (t_idx * self.batch_size + rows[:, None]).reshape(-1)

    def leaf_gather(s):
      fl = s.reshape((self.capacity * self.batch_size,) + s.shape[2:])
      out = gather_rows(fl, flat_idx)
      return out.reshape((t_idx.shape[0], n) + s.shape[2:])

    out = jax.tree_util.tree_map(leaf_gather, storage)
    return self.packer.from_stored(out, outer_ndim=2)

  # -- priority maintenance -------------------------------------------------
  def update_priorities(self, state, info: PrioritizedBufferInfo,
                        td_errors: jax.Array) -> PrioritizedReplayState:
    """Scatter |td_error| + eps back to the sampled items (the
    ``update_priorities`` surface of reverb_replay_buffer.py:436). Stale
    ids (overwritten since sampling) are dropped. Duplicate ids within
    one call: the max of their new priorities wins (deterministic)."""
    new_p = jnp.abs(td_errors).astype(jnp.float32) + self.epsilon
    pos = (info.ids % self.capacity).astype(jnp.int32)
    live = (info.ids >= 0) & (info.ids >= state.count - self.size(state))

    cur = state.priorities[pos, info.rows]
    # max-combine: zero the live target slots, then scatter-max the new
    # values; stale updates contribute their current value to the min
    # (no-op) and 0 to the max (no-op), so they never resurrect or
    # clobber anything.
    reset = state.priorities.at[pos, info.rows].min(
        jnp.where(live, 0.0, cur))
    priorities = reset.at[pos, info.rows].max(
        jnp.where(live, new_p, 0.0))
    return state.replace(
        priorities=priorities,
        max_priority=jnp.maximum(state.max_priority,
                                 jnp.where(live, new_p, 0.0).max()))
