"""Episodic replay: whole-episode storage as padded on-HBM tables.

Analogue of ``tf_agents/replay_buffers/episodic_replay_buffer.py:52``
(variable-length episodes in TensorLists + episode ids + completion
callbacks). TPU-native shape: a fixed pool of episode slots
``[num_slots, max_episode_len, ...]`` with per-slot lengths; frames append
via dynamic-update-slice; completed episodes sample uniformly with a
validity mask instead of ragged shapes (XLA needs static bounds anyway).

Writer state tracks one open episode per env row (the analogue of the
reference's per-actor episode ids).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from agents_tpu.specs import array_spec


@struct.dataclass
class EpisodicReplayState:
  storage: Any            # [num_slots, max_len, ...]
  lengths: jax.Array      # [num_slots] committed episode lengths (0 = free)
  next_slot: jax.Array    # scalar ring pointer over slots
  open_slot: jax.Array    # [B] slot currently being written per row
  open_len: jax.Array     # [B] frames written to the open episode
  num_completed: jax.Array  # scalar total completed episodes


class EpisodicReplay:

  def __init__(self, data_spec, batch_size: int, num_slots: int,
               max_episode_len: int):
    self.data_spec = data_spec
    self.batch_size = batch_size
    self.num_slots = num_slots
    self.max_episode_len = max_episode_len

  def init(self) -> EpisodicReplayState:
    storage = array_spec.zero_spec_nest(
        self.data_spec, outer_dims=(self.num_slots, self.max_episode_len))
    B = self.batch_size
    return EpisodicReplayState(
        storage=storage,
        lengths=jnp.zeros((self.num_slots,), jnp.int32),
        next_slot=jnp.asarray(B, jnp.int32),  # rows 0..B-1 start open
        open_slot=jnp.arange(B, dtype=jnp.int32),
        open_len=jnp.zeros((B,), jnp.int32),
        num_completed=jnp.zeros((), jnp.int32))

  def add_batch(self, state: EpisodicReplayState,
                items) -> EpisodicReplayState:
    """Append one frame per row; commit episodes whose frame is_boundary
    or whose next_step_type is LAST (frame carries the episode end)."""
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

    # Assign fresh slots to completed rows (ring over slots); rows that
    # did not finish scatter out of bounds (dropped).
    order = jnp.cumsum(done.astype(jnp.int32)) - done.astype(jnp.int32)
    fresh = (state.next_slot + order) % self.num_slots
    open_slot = jnp.where(done, fresh, state.open_slot)
    open_len = jnp.where(done, 0, new_len)
    # Newly opened slots are cleared (length 0 marks in-progress).
    scatter_idx = jnp.where(done, fresh, self.num_slots)
    lengths = lengths.at[scatter_idx].set(0, mode="drop")

    return EpisodicReplayState(
        storage=storage, lengths=lengths,
        next_slot=(state.next_slot + completed) % self.num_slots,
        open_slot=open_slot, open_len=open_len,
        num_completed=state.num_completed + completed)

  def sample_episodes(self, state: EpisodicReplayState, key,
                      sample_batch_size: int):
    """Uniformly sample completed episodes.

    Returns (episodes [S, max_len, ...], mask [S, max_len]).
    """
    valid = state.lengths > 0
    # Uniform over valid slots via masked categorical.
    logits = jnp.where(valid, 0.0, -1e9)
    slots = jax.random.categorical(
        key, jnp.broadcast_to(logits, (sample_batch_size,) + logits.shape),
        axis=-1)
    eps = jax.tree_util.tree_map(lambda s: s[slots], state.storage)
    lens = state.lengths[slots]
    mask = (jnp.arange(self.max_episode_len)[None, :]
            < lens[:, None]).astype(jnp.float32)
    return eps, mask
