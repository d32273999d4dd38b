"""Episodic replay: whole-episode storage as padded on-HBM tables.

Analogue of ``tf_agents/replay_buffers/episodic_replay_buffer.py:52``
(variable-length episodes in TensorLists + episode ids + completion
callbacks + sampling in-progress episodes + add_sequence :332). TPU-native
shape: a fixed pool of episode slots ``[num_slots, max_episode_len, ...]``
with per-slot lengths; frames append via dynamic-update-slice; episodes
sample uniformly with a validity mask instead of ragged shapes (XLA needs
static bounds anyway).

Capability mapping to the reference:
- episode ids: every opened episode gets a monotonically increasing id
  (reference `_get_episode_id`); ids ride the state pytree and come back
  from `sample_episodes(..., return_info=True)` so samplers can detect
  an episode that was overwritten or extended between calls.
- completion callbacks (reference `episode_callback`): callbacks can't
  fire inside a jitted program, so `add_batch(..., return_completed=True)`
  returns the ids completed this step; `CompletionCallback` drains that
  on the host and invokes Python callbacks.
- in-progress episodes: `sample_episodes(..., completed_only=False)`
  includes per-row open episodes at their current length (reference
  `completed_only=False` dataset option).
- whole-sequence writes: `add_sequence` commits a [T, ...] episode in
  one call (reference :332).

Writer state tracks one open episode per env row (the analogue of the
reference's per-actor episode ids).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from agents_tpu.specs import array_spec


@struct.dataclass
class EpisodicReplayState:
  storage: Any            # [num_slots, max_len, ...]
  lengths: jax.Array      # [num_slots] committed episode lengths (0 = free)
  episode_ids: jax.Array  # [num_slots] id of episode in slot (-1 = free)
  next_slot: jax.Array    # scalar ring pointer over slots
  next_episode_id: jax.Array  # scalar monotone id source
  open_slot: jax.Array    # [B] slot currently being written per row
  open_len: jax.Array     # [B] frames written to the open episode
  num_completed: jax.Array  # scalar total completed episodes


class EpisodicReplay:

  def __init__(self, data_spec, batch_size: int, num_slots: int,
               max_episode_len: int):
    if num_slots < 2 * batch_size + 1:
      # Worst case one add_batch call: B rows hold open slots AND all B
      # complete, each needing a fresh slot while its just-committed
      # slot stays protected — 2B busy slots; fresh-slot assignment
      # (which skips busy slots) needs at least one free.
      raise ValueError(
          f"num_slots ({num_slots}) must be >= 2*batch_size+1 "
          f"({2 * batch_size + 1}) so fresh-slot assignment always "
          "finds a free slot")
    self.data_spec = data_spec
    self.batch_size = batch_size
    self.num_slots = num_slots
    self.max_episode_len = max_episode_len

  def init(self) -> EpisodicReplayState:
    storage = array_spec.zero_spec_nest(
        self.data_spec, outer_dims=(self.num_slots, self.max_episode_len))
    B = self.batch_size
    episode_ids = jnp.full((self.num_slots,), -1, jnp.int32)
    episode_ids = episode_ids.at[jnp.arange(B)].set(jnp.arange(B))
    return EpisodicReplayState(
        storage=storage,
        lengths=jnp.zeros((self.num_slots,), jnp.int32),
        episode_ids=episode_ids,
        next_slot=jnp.asarray(B, jnp.int32),  # rows 0..B-1 start open
        next_episode_id=jnp.asarray(B, jnp.int32),
        open_slot=jnp.arange(B, dtype=jnp.int32),
        open_len=jnp.zeros((B,), jnp.int32),
        num_completed=jnp.zeros((), jnp.int32))

  def add_batch(self, state: EpisodicReplayState, items,
                return_completed: bool = False):
    """Append one frame per row; commit episodes whose frame carries the
    episode end (next_step_type LAST).

    With `return_completed=True` also returns the per-row episode ids
    completed by this call (-1 where the row's episode continues) — the
    jit-compatible surface for the reference's completion callbacks."""
    B = self.batch_size
    write_t = jnp.minimum(state.open_len, self.max_episode_len - 1)

    def write_leaf(s, x):
      return s.at[state.open_slot, write_t].set(x.astype(s.dtype))

    storage = jax.tree_util.tree_map(write_leaf, state.storage, items)
    new_len = jnp.minimum(state.open_len + 1, self.max_episode_len)

    # An episode completes when the frame's next_step_type is LAST (2).
    done = items.next_step_type == 2

    # Commit: store lengths for completed rows.
    lengths = state.lengths.at[state.open_slot].set(
        jnp.where(done, new_len, state.lengths[state.open_slot]))
    completed = jnp.sum(done.astype(jnp.int32))
    completed_ids = jnp.where(done, state.episode_ids[state.open_slot], -1)

    # Assign fresh slots to completed rows from the ring cursor,
    # SKIPPING slots that are busy: still open for another row, or just
    # committed this call. A plain `(next_slot + order) % num_slots`
    # collides after the ring wraps — two rows then interleave frames
    # into one slot and `lengths.at[fresh].set(0)` wipes a newest-first
    # committed episode instead of the oldest.
    ns = self.num_slots
    busy = jnp.zeros((ns,), bool).at[state.open_slot].set(True)

    def assign(carry, d):
      cursor, busy_m = carry
      free = jax.lax.while_loop(
          lambda c: busy_m[c % ns], lambda c: c + 1, cursor)
      slot = free % ns
      new_busy = jnp.where(d, busy_m.at[slot].set(True), busy_m)
      new_cursor = jnp.where(d, free + 1, cursor)
      return (new_cursor, new_busy), jnp.where(d, slot, ns)

    (final_cursor, _), fresh = jax.lax.scan(
        assign, (state.next_slot, busy), done)
    order = jnp.cumsum(done.astype(jnp.int32)) - done.astype(jnp.int32)
    open_slot = jnp.where(done, fresh, state.open_slot)
    open_len = jnp.where(done, 0, new_len)
    # Newly opened slots are cleared (length 0 marks in-progress) and
    # receive fresh monotone episode ids; non-completing rows emitted
    # `ns` and are dropped by the scatter.
    lengths = lengths.at[fresh].set(0, mode="drop")
    new_ids = state.next_episode_id + order
    episode_ids = state.episode_ids.at[fresh].set(new_ids, mode="drop")

    new_state = EpisodicReplayState(
        storage=storage, lengths=lengths, episode_ids=episode_ids,
        next_slot=final_cursor % ns,
        next_episode_id=state.next_episode_id + completed,
        open_slot=open_slot, open_len=open_len,
        num_completed=state.num_completed + completed)
    if return_completed:
      return new_state, completed_ids
    return new_state

  def add_sequence(self, state: EpisodicReplayState,
                   sequence, length=None) -> EpisodicReplayState:
    """Commit one whole episode ``[T, ...]`` in a single call (reference
    add_sequence :332). `length` (dynamic, <= T) marks the valid prefix;
    defaults to the full static T. Takes the next ring slot."""
    T = jax.tree_util.tree_leaves(sequence)[0].shape[0]
    if T > self.max_episode_len:
      raise ValueError(
          f"sequence length {T} exceeds max_episode_len "
          f"{self.max_episode_len}")
    length = jnp.asarray(T if length is None else length, jnp.int32)
    # Skip slots currently OPEN for add_batch rows (same protection as
    # add_batch's fresh-slot assignment): taking next_slot blindly can
    # land on an in-progress row's slot after the ring wraps, after
    # which that row's writes clobber the committed sequence.
    ns = self.num_slots
    busy = jnp.zeros((ns,), bool).at[state.open_slot].set(True)
    free = jax.lax.while_loop(
        lambda c: busy[c % ns], lambda c: c + 1, state.next_slot)
    slot = free % ns

    def write_leaf(s, x):
      pad = ((0, self.max_episode_len - T),) + ((0, 0),) * (x.ndim - 1)
      return s.at[slot].set(jnp.pad(x.astype(s.dtype), pad))

    storage = jax.tree_util.tree_map(write_leaf, state.storage, sequence)
    return state.replace(
        storage=storage,
        lengths=state.lengths.at[slot].set(length),
        episode_ids=state.episode_ids.at[slot].set(state.next_episode_id),
        next_slot=(free + 1) % self.num_slots,
        next_episode_id=state.next_episode_id + 1,
        num_completed=state.num_completed + 1)

  def _effective_lengths(self, state: EpisodicReplayState,
                         completed_only: bool):
    """Per-slot sampleable length: committed episodes always; open
    episodes at their current length when completed_only=False."""
    if completed_only:
      return state.lengths
    return state.lengths.at[state.open_slot].set(
        jnp.maximum(state.open_len,
                    state.lengths[state.open_slot]), mode="drop")

  def sample_episodes(self, state: EpisodicReplayState, key,
                      sample_batch_size: int,
                      completed_only: bool = True,
                      return_info: bool = False):
    """Uniformly sample episodes.

    Returns (episodes [S, max_len, ...], mask [S, max_len]); with
    `return_info=True` also a dict with the sampled slots' episode ids
    and lengths (reference BufferInfo episode ids)."""
    eff = self._effective_lengths(state, completed_only)
    valid = eff > 0
    # Empty-buffer guard (same contract as uniform_replay.check_min_size):
    # with zero valid slots the masked categorical would silently return
    # arbitrary uninitialized episodes with all-zero masks, and a
    # mask-weighted mean downstream turns into NaN.
    from agents_tpu.replay_buffers.uniform_replay import check_min_size
    check_min_size(jnp.sum(valid.astype(jnp.int32)), 1)
    # Uniform over valid slots via masked categorical.
    logits = jnp.where(valid, 0.0, -1e9)
    slots = jax.random.categorical(
        key, jnp.broadcast_to(logits, (sample_batch_size,) + logits.shape),
        axis=-1)
    eps = jax.tree_util.tree_map(lambda s: s[slots], state.storage)
    lens = eff[slots]
    mask = (jnp.arange(self.max_episode_len)[None, :]
            < lens[:, None]).astype(jnp.float32)
    if return_info:
      return eps, mask, {"episode_ids": state.episode_ids[slots],
                         "lengths": lens, "slots": slots}
    return eps, mask


class CompletionCallback:
  """Host-side bridge for the reference's episode completion callbacks
  (episodic_replay_buffer.py `episode_callback`): feed it the
  `completed_ids` coming out of jitted `add_batch(...,
  return_completed=True)` calls and it invokes the Python callbacks once
  per completed episode id, in id order."""

  def __init__(self, callbacks: Sequence[Callable[[int], None]]):
    self.callbacks = list(callbacks)

  def __call__(self, completed_ids) -> int:
    ids = np.asarray(jax.device_get(completed_ids)).reshape(-1)
    fired = 0
    for eid in sorted(int(i) for i in ids if i >= 0):
      for cb in self.callbacks:
        cb(eid)
      fired += 1
    return fired
