"""On-HBM uniform replay: a jittable ring buffer over device memory.

TPU-native replacement for both ``tf_agents/replay_buffers/
tf_uniform_replay_buffer.py:47`` (in-graph ring over tf.Variables) and the
dm-reverb C++ server in the actor-learner path (SURVEY.md §2.9): replay
state is just a pytree — it lives sharded in HBM, `add_batch` is a
dynamic-update-slice at ``frame % capacity`` (reference `_increment_last_id`
:582 / row math :603), and `sample` gathers uniform ids from the valid
window (reference `_get_next` :211-315). Because state is a pytree, the
whole collect -> insert -> sample -> train iteration fuses into ONE jitted
program with zero host round-trips.

Layout: time-major ``[capacity, B, ...]`` per leaf, with `B` the number of
parallel env rows (`batch_size` in the reference). Multi-host sharding
shards the B axis over the mesh's `data` axis.

Valid-window math (wraparound-safe, mirrors `_valid_range_ids`):
  count = frames added so far; size = min(count, capacity)
  a window of `num_steps` starting at time t is valid iff
     count - size <= t  and  t + num_steps <= count
so t ~ Uniform[count - size, count - num_steps].
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct



@struct.dataclass
class ReplayState:
  storage: Any          # pytree: [capacity, B, ...]
  count: jax.Array      # int32 scalar: total frames added


class BufferInfo(NamedTuple):
  """Sample metadata (reference BufferInfo(ids, probabilities))."""
  ids: jax.Array            # [sample_batch_size] time ids
  rows: jax.Array           # [sample_batch_size] env-row ids
  probabilities: jax.Array  # [sample_batch_size]


def renorm_count(count, capacity: int):
  """Keep the int32 frame counter far from overflow (the reference uses
  int64 ids; x64 is disabled under jit here). All window/slot math
  depends on `count` only through `count % capacity` and the recent
  window `count - size`, so subtracting a multiple of capacity once the
  counter crosses 2^30 is invisible — an unrenormalized counter wraps
  negative after ~2.1e9 frames and silently corrupts the valid window."""
  wrap = max((1 << 29) // capacity * capacity, capacity)
  return jnp.where(count >= (1 << 30), count - wrap, count)


def check_min_size(count, n: int, debug_asserts: bool = False) -> None:
  """Underfill guard: sampling with count < num_steps would return
  windows of never-written storage (the valid-window clamps otherwise
  hide it — the reference blocks structurally via Reverb's MinSize rate
  limiter, train/utils/replay_buffer_utils.py:29-56). Raises at trace
  time when `count` is concrete; under jit, raises from a host callback
  only when `debug_asserts` is set (the callback syncs the device every
  sample call — debug runs only)."""
  if jax.core.is_concrete(count):
    if int(count) < n:
      raise ValueError(
          f"sample(num_steps={n}) on an underfilled replay buffer "
          f"(count={int(count)}): wait for at least num_steps frames "
          "(use min_replay_frames / rate_limiter.MinSize on the host "
          "side)")
  elif debug_asserts:
    def _assert(c):
      if int(c) < n:
        raise RuntimeError(
            f"replay underfilled at run time: count={int(c)} < "
            f"num_steps={n} — sampled windows would contain "
            "never-written frames")
    jax.debug.callback(_assert, count)


class UniformReplay:
  """Uniform-sampling ring buffer.

  Args:
    data_spec: spec nest for one (unbatched) frame.
    batch_size: number of parallel env rows B (reference add_batch batch).
    max_length: ring capacity per row (reference max_length).
  """

  def __init__(self, data_spec, batch_size: int, max_length: int,
               pack_large_rows: bool = True,
               debug_min_size_asserts: bool = False,
               sort_for_locality: bool = False):
    from agents_tpu.ops.replay_gather import RowPacker

    self.data_spec = data_spec
    self.batch_size = int(batch_size)
    self.capacity = int(max_length)
    self.pack_large_rows = bool(pack_large_rows)
    self.sort_for_locality = bool(sort_for_locality)
    # Reverb blocks underfilled sampling structurally (MinSize limiter,
    # reference train/utils/replay_buffer_utils.py:29-56); a jittable ring
    # can't block, so `sample` raises at trace time whenever `count` is
    # concrete, and — with this flag — also installs a host debug
    # callback that raises at run time under jit. The callback syncs the
    # device every sample call, so it is debug-only: leave it off in
    # fused hot loops and gate with `min_replay_frames` there instead.
    self.debug_min_size_asserts = bool(debug_min_size_asserts)
    # Multi-KB leaves (e.g. Atari frame stacks) are stored tile-aligned
    # ([r, 128] blocks): measured 1.79x faster to sample on TPU v5e than
    # the natural layout (ops/replay_gather.py docstring).
    self.packer = RowPacker(data_spec, enabled=pack_large_rows)

  # -- lifecycle -----------------------------------------------------------
  def init(self) -> ReplayState:
    storage = self.packer.init_storage((self.capacity, self.batch_size))
    return ReplayState(storage=storage, count=jnp.zeros((), jnp.int32))

  def clear(self, state: ReplayState) -> ReplayState:
    return state.replace(count=jnp.zeros((), jnp.int32))

  def size(self, state: ReplayState):
    return jnp.minimum(state.count, self.capacity)

  # -- write ---------------------------------------------------------------
  def add_batch(self, state: ReplayState, items) -> ReplayState:
    """Write one frame per env row: items is [B, ...] (reference
    `_add_batch` :182)."""
    row = state.count % self.capacity
    items = self.packer.to_stored(items, outer_ndim=1)
    storage = jax.tree_util.tree_map(
        lambda s, x: s.at[row].set(x.astype(s.dtype)), state.storage, items)
    return ReplayState(storage=storage,
                       count=renorm_count(state.count + 1, self.capacity))

  def add_sequence(self, state: ReplayState, items) -> ReplayState:
    """Write [T, B, ...] frames via lax.scan of add_batch."""

    def body(st, frame):
      return self.add_batch(st, frame), ()

    state, _ = jax.lax.scan(body, state, items)
    return state

  # -- read ----------------------------------------------------------------
  def sample(self, state: ReplayState, key, sample_batch_size: int,
             num_steps: Optional[int] = None):
    """Uniform sample of windows.

    Returns (batch, BufferInfo). With `num_steps=None` batch leaves are
    [S, ...]; otherwise [S, num_steps, ...] (matching `as_dataset`
    conventions, reference :329).
    """
    n = 1 if num_steps is None else int(num_steps)
    if n > self.capacity:
      # Once count > capacity the window math would wrap the ring and
      # splice old frames in as the "continuation" with no error.
      raise ValueError(
          f"sample(num_steps={n}) exceeds ring capacity {self.capacity}: "
          "windows longer than the ring cannot be time-contiguous")
    self._check_min_size(state.count, n)
    k_t, k_b = jax.random.split(key)
    size = self.size(state)
    lo = state.count - size                      # oldest valid time id
    hi = state.count - n + 1                     # exclusive upper bound
    num_valid = jnp.maximum(hi - lo, 1)
    t0 = lo + jax.random.randint(k_t, (sample_batch_size,), 0, num_valid)
    rows = jax.random.randint(k_b, (sample_batch_size,), 0, self.batch_size)
    # Optional: gather in ascending HBM address order. A uniform batch
    # is an unordered set (every training reduction over it is
    # permutation-invariant), so reordering (t0, rows) pairs by flat
    # address is semantically free. Measured on v5e at mnih15 scale
    # (262k-frame ring, bench-level fill, interleaved same-process A/B
    # so tunnel drift cancels): sorted 1.478 vs unsorted 1.467 ms/iter
    # median — NO win, the argsort costs ~0.7%. Default OFF; kept as a
    # flag because the measurement is rig-specific (a part with a
    # smaller HBM row buffer may benefit). Verdict + data:
    # benchmark/profiles/gather_fill_effect.json. An earlier cross-
    # process comparison suggested -15%; that was axon-tunnel run-to-
    # run drift (the no-gather control moved just as much), not signal.
    if self.sort_for_locality:
      order = jnp.argsort(t0 * self.batch_size + rows)
      t0, rows = t0[order], rows[order]

    batch = self._gather(state.storage, t0, rows, n)
    if num_steps is None:
      batch = jax.tree_util.tree_map(lambda x: x[:, 0], batch)
    probs = jnp.full((sample_batch_size,),
                     1.0 / (jnp.maximum(num_valid, 1) * self.batch_size),
                     jnp.float32)
    return batch, BufferInfo(ids=t0, rows=rows, probabilities=probs)

  def _check_min_size(self, count, n: int) -> None:
    check_min_size(count, n, self.debug_min_size_asserts)

  def _gather(self, storage, t0, rows, n):
    """Gather [S, n, ...] windows by flat index. Packed leaves are
    unpacked back to their natural feature shape after the gather."""
    from agents_tpu.ops.replay_gather import gather_rows

    # time indices [S, n]
    t_idx = (t0[:, None] + jnp.arange(n)[None, :]) % self.capacity
    flat_idx = (t_idx * self.batch_size + rows[:, None]).reshape(-1)

    def leaf_gather(s):
      flat = s.reshape((self.capacity * self.batch_size,) + s.shape[2:])
      out = gather_rows(flat, flat_idx)
      return out.reshape((t_idx.shape[0], n) + s.shape[2:])

    out = jax.tree_util.tree_map(leaf_gather, storage)
    return self.packer.from_stored(out, outer_ndim=2)

  def sample_sharded(self, state: ReplayState, key, sample_batch_size: int,
                     mesh, num_steps: Optional[int] = None,
                     axis_name: str = "data"):
    """Shard-local uniform sample over a mesh-sharded buffer.

    With storage sharded P(None, '<axis>') on the env-row axis, a plain
    `sample` makes GSPMD ALL-GATHER the entire storage every iteration
    (measured: every [capacity, B] leaf moves, each step). This method
    instead samples S/n windows per shard from that shard's own rows
    via shard_map — gathers stay device-local, the returned batch is
    sharded P('<axis>'), and zero replay bytes cross the interconnect.

    Statistically identical to `sample` for uniform row choice: row ids
    stratified by shard (S/n each) instead of iid over B — each item's
    inclusion probability is unchanged.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    n = mesh.shape[axis_name]
    if self.batch_size % n or sample_batch_size % n:
      raise ValueError(
          f"batch_size {self.batch_size} and sample_batch_size "
          f"{sample_batch_size} must both be divisible by the "
          f"'{axis_name}' axis size {n}")
    b_local = self.batch_size // n
    local_rb = UniformReplay(
        self.data_spec, b_local, self.capacity,
        pack_large_rows=self.pack_large_rows,
        debug_min_size_asserts=self.debug_min_size_asserts)

    def local_sample(storage, count, k):
      i = jax.lax.axis_index(axis_name)
      batch, info = local_rb.sample(
          ReplayState(storage=storage, count=count[0]),
          jax.random.fold_in(k[0], i), sample_batch_size // n, num_steps)
      info = BufferInfo(ids=info.ids, rows=info.rows + i * b_local,
                        probabilities=info.probabilities / n)
      return batch, info

    storage_specs = jax.tree_util.tree_map(lambda _: P(None, axis_name),
                                           state.storage)
    out_specs = (jax.tree_util.tree_map(lambda _: P(axis_name),
                                        state.storage),
                 BufferInfo(ids=P(axis_name), rows=P(axis_name),
                            probabilities=P(axis_name)))
    # count/key ride a size-1 leading axis so shard_map can replicate
    # them without rep-checking custom PRNG types.
    return shard_map(
        local_sample, mesh=mesh,
        in_specs=(storage_specs, P(), P()),
        out_specs=out_specs, check_rep=False)(
            state.storage, state.count[None], key[None])

  def gather_all(self, state: ReplayState):
    """All frames, batch-major [B, capacity, ...], in insertion order
    (reference gather_all). Only meaningful before wraparound for exact
    ordering; after wraparound the ring is rotated so index 0 is oldest."""
    start = jnp.where(state.count >= self.capacity,
                      state.count % self.capacity, 0)
    order = (jnp.arange(self.capacity) + start) % self.capacity

    def leaf(s):
      out = jnp.take(s, order, axis=0)          # [capacity, B, ...]
      return jnp.moveaxis(out, 0, 1)            # [B, capacity, ...]

    out = jax.tree_util.tree_map(leaf, state.storage)
    return self.packer.from_stored(out, outer_ndim=2)
