"""Replay buffer semantics (mirrors tf_uniform_replay_buffer_test.py).

Property tests for valid-window sampling and n-step adjacency after
wraparound (reference _valid_range_ids, tf_uniform_replay_buffer.py:211-315).
"""
import jax
import jax.numpy as jnp
import numpy as np

from agents_tpu import specs
from agents_tpu.replay_buffers import UniformReplay

SPEC = {"x": specs.ArraySpec((), np.int32)}


def _fill(replay, state, values):
  # values: [T] ints; each add writes value*10+row per row.
  for v in values:
    items = {"x": jnp.asarray([v * 10 + r for r in range(replay.batch_size)],
                              jnp.int32)}
    state = replay.add_batch(state, items)
  return state


def test_add_and_size():
  replay = UniformReplay(SPEC, batch_size=2, max_length=4)
  state = replay.init()
  assert int(replay.size(state)) == 0
  state = _fill(replay, state, range(3))
  assert int(replay.size(state)) == 3
  state = _fill(replay, state, range(3, 10))
  assert int(replay.size(state)) == 4  # capped at capacity


def test_sample_single_frames_valid():
  replay = UniformReplay(SPEC, batch_size=2, max_length=8)
  state = replay.init()
  state = _fill(replay, state, range(5))
  batch, info = replay.sample(state, jax.random.key(0), 64)
  vals = np.asarray(batch["x"])
  times = vals // 10
  rows = vals % 10
  assert vals.shape == (64,)
  assert times.min() >= 0 and times.max() <= 4  # only written frames
  assert set(np.unique(rows)).issubset({0, 1})
  # ids reported match content
  assert np.all(np.asarray(info.ids) == times)


def test_sample_two_step_adjacency_after_wraparound():
  replay = UniformReplay(SPEC, batch_size=1, max_length=4)
  state = replay.init()
  state = _fill(replay, state, range(11))  # count=11 > capacity=4
  batch, info = replay.sample(state, jax.random.key(1), 256, num_steps=2)
  vals = np.asarray(batch["x"])  # [256, 2]
  t = vals // 10
  # windows are time-adjacent
  np.testing.assert_array_equal(t[:, 1], t[:, 0] + 1)
  # only frames still in the ring: times 7..10
  assert t.min() >= 7 and t.max() <= 10
  # start id never the newest frame (needs a successor)
  assert t[:, 0].max() <= 9


def test_sample_uniform_coverage():
  replay = UniformReplay(SPEC, batch_size=1, max_length=16)
  state = replay.init()
  state = _fill(replay, state, range(8))
  batch, _ = replay.sample(state, jax.random.key(2), 2000, num_steps=2)
  t = np.asarray(batch["x"])[:, 0] // 10
  counts = np.bincount(t, minlength=8)
  # starts 0..6 all hit, roughly uniformly
  assert np.all(counts[:7] > 150)
  assert counts[7] == 0  # last frame can't start a 2-window


def test_add_sequence_matches_repeated_add():
  replay = UniformReplay(SPEC, batch_size=2, max_length=8)
  s1 = replay.init()
  s1 = _fill(replay, s1, range(5))
  s2 = replay.init()
  seq = {"x": jnp.asarray(
      [[v * 10 + r for r in range(2)] for v in range(5)], jnp.int32)}
  s2 = replay.add_sequence(s2, seq)
  np.testing.assert_array_equal(np.asarray(s1.storage["x"]),
                                np.asarray(s2.storage["x"]))
  assert int(s1.count) == int(s2.count)


def test_gather_all_order():
  replay = UniformReplay(SPEC, batch_size=1, max_length=4)
  state = replay.init()
  state = _fill(replay, state, range(6))  # ring holds 2,3,4,5
  out = np.asarray(replay.gather_all(state)["x"])[0] // 10
  np.testing.assert_array_equal(out, [2, 3, 4, 5])
  # before wraparound: insertion order preserved
  s2 = _fill(replay, replay.init(), range(3))
  out2 = np.asarray(replay.gather_all(s2)["x"])[0] // 10
  np.testing.assert_array_equal(out2[:3], [0, 1, 2])


def test_clear():
  replay = UniformReplay(SPEC, batch_size=1, max_length=4)
  state = _fill(replay, replay.init(), range(3))
  state = replay.clear(state)
  assert int(replay.size(state)) == 0


# -- underfill guard (Reverb MinSize analogue) --------------------------------

def test_underfilled_sample_raises_eagerly():
  import pytest

  replay = UniformReplay(SPEC, batch_size=2, max_length=8)
  state = replay.init()
  with pytest.raises(ValueError, match="underfilled"):
    replay.sample(state, jax.random.key(0), 4)
  state = _fill(replay, state, range(1))
  with pytest.raises(ValueError, match="underfilled"):
    replay.sample(state, jax.random.key(0), 4, num_steps=2)
  # exactly num_steps frames: valid
  state = _fill(replay, state, range(1, 2))
  replay.sample(state, jax.random.key(0), 4, num_steps=2)


def test_underfilled_sample_debug_assert_under_jit():
  import pytest

  replay = UniformReplay(SPEC, batch_size=2, max_length=8,
                         debug_min_size_asserts=True)

  @jax.jit
  def draw(state):
    batch, _ = replay.sample(state, jax.random.key(0), 4, num_steps=2)
    return batch

  state = _fill(replay, replay.init(), range(4))
  jax.block_until_ready(draw(state))  # filled: no error
  with pytest.raises(Exception, match="underfilled"):
    jax.block_until_ready(draw(replay.init()))


def test_underfilled_prioritized_sample_raises_eagerly():
  import pytest

  from agents_tpu.replay_buffers import PrioritizedReplay

  replay = PrioritizedReplay(SPEC, batch_size=2, max_length=8)
  with pytest.raises(ValueError, match="underfilled"):
    replay.sample(replay.init(), jax.random.key(0), 4, num_steps=2)
