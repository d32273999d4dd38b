"""Host-side (numpy) replay buffers.

Analogues of ``tf_agents/replay_buffers/py_uniform_replay_buffer.py``
(numpy ring) and ``py_hashed_replay_buffer.py`` (frame-deduplicating
storage for Atari memory savings).
"""
from __future__ import annotations

import hashlib
import threading
from typing import Any, Optional

import numpy as np

import jax

from agents_tpu.specs import array_spec


class PyUniformReplayBuffer:
  """Thread-safe numpy ring over spec-conforming frames."""

  def __init__(self, data_spec, capacity: int):
    self.data_spec = data_spec
    self.capacity = capacity
    self._lock = threading.Lock()
    self._storage = array_spec.map_spec_nest(
        lambda s: np.zeros((capacity,) + s.shape, s.dtype), data_spec)
    self._count = 0

  def __len__(self):
    return min(self._count, self.capacity)

  def add(self, item):
    with self._lock:
      idx = self._count % self.capacity
      leaves = jax.tree_util.tree_leaves(item)
      slots = jax.tree_util.tree_leaves(self._storage)
      for slot, leaf in zip(slots, leaves):
        slot[idx] = np.asarray(leaf)
      self._count += 1

  def add_batch(self, items):
    leaves = jax.tree_util.tree_leaves(items)
    b = leaves[0].shape[0]
    for i in range(b):
      self.add(jax.tree_util.tree_map(lambda x: np.asarray(x)[i], items))

  def sample(self, batch_size: int, num_steps: Optional[int] = None,
             rng: Optional[np.random.RandomState] = None):
    rng = rng or np.random
    with self._lock:
      size = len(self)
      n = num_steps or 1
      lo = self._count - size
      hi = self._count - n + 1
      if hi <= lo:
        raise ValueError("Not enough frames to sample")
      t0 = rng.randint(lo, hi, size=batch_size)
      idx = (t0[:, None] + np.arange(n)[None, :]) % self.capacity
      out = jax.tree_util.tree_map(lambda s: s[idx], self._storage)
      if num_steps is None:
        out = jax.tree_util.tree_map(lambda x: x[:, 0], out)
      return out

  def gather_all(self):
    with self._lock:
      size = len(self)
      start = (self._count - size) % self.capacity
      order = (np.arange(size) + start) % self.capacity
      return jax.tree_util.tree_map(lambda s: s[order], self._storage)

  def clear(self):
    with self._lock:
      self._count = 0


class PyHashedReplayBuffer(PyUniformReplayBuffer):
  """Deduplicates identical observation frames by content hash: repeated
  Atari frames store one copy (reference py_hashed_replay_buffer.py)."""

  def __init__(self, data_spec, capacity: int):
    super().__init__(data_spec, capacity)
    # observation stored as indices into a dedup pool.
    self._pool: dict = {}
    self._pool_list: list = []
    self._obs_idx = np.zeros((capacity,), np.int64)
    obs_spec = data_spec.observation if hasattr(data_spec, "observation") \
        else data_spec["observation"]
    self._obs_spec = obs_spec
    # Remove observation array from dense storage.

  def add(self, item):
    obs = np.asarray(
        item.observation if hasattr(item, "observation")
        else item["observation"])
    h = hashlib.blake2b(obs.tobytes(), digest_size=16).digest()
    with self._lock:
      if h not in self._pool:
        self._pool[h] = len(self._pool_list)
        self._pool_list.append(obs.copy())
      pool_idx = self._pool[h]
      idx = self._count % self.capacity
      leaves = jax.tree_util.tree_leaves(item)
      slots = jax.tree_util.tree_leaves(self._storage)
      for slot, leaf in zip(slots, leaves):
        slot[idx] = np.asarray(leaf)
      self._obs_idx[idx] = pool_idx
      self._count += 1

  @property
  def num_unique_observations(self):
    return len(self._pool_list)
