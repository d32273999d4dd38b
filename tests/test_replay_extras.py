"""Episodic replay, host replay buffers, dataset IO tests."""
import jax
import jax.numpy as jnp
import numpy as np

from agents_tpu import specs
from agents_tpu.replay_buffers.episodic_replay import EpisodicReplay
from agents_tpu.replay_buffers.py_uniform_replay import (
    PyHashedReplayBuffer, PyUniformReplayBuffer)
from agents_tpu.trajectories import trajectory as tj

SPEC = tj.Trajectory(
    step_type=specs.ArraySpec((), np.int32),
    observation=specs.ArraySpec((2,), np.float32),
    action=specs.ArraySpec((), np.int32),
    policy_info=(),
    next_step_type=specs.ArraySpec((), np.int32),
    reward=specs.ArraySpec((), np.float32),
    discount=specs.ArraySpec((), np.float32),
)


def _frame(B, t, done):
  return tj.Trajectory(
      step_type=jnp.full((B,), 0 if t == 0 else 1, jnp.int32),
      observation=jnp.full((B, 2), float(t)),
      action=jnp.full((B,), t, jnp.int32),
      policy_info=(),
      next_step_type=jnp.full((B,), 2 if done else 1, jnp.int32),
      reward=jnp.ones((B,)),
      discount=jnp.ones((B,)))


def test_episodic_replay_commit_and_sample():
  replay = EpisodicReplay(SPEC, batch_size=2, num_slots=8,
                          max_episode_len=5)
  state = replay.init()
  add = jax.jit(replay.add_batch)
  # 3-frame episode, then a 2-frame episode.
  for t, done in [(0, False), (1, False), (2, True)]:
    state = add(state, _frame(2, t, done))
  assert int(state.num_completed) == 2  # both rows finished
  for t, done in [(0, False), (1, True)]:
    state = add(state, _frame(2, t, done))
  assert int(state.num_completed) == 4
  eps, mask = replay.sample_episodes(state, jax.random.key(0), 6)
  assert eps.observation.shape == (6, 5, 2)
  lens = np.asarray(mask.sum(axis=1))
  assert set(lens).issubset({2.0, 3.0})
  # Masked frames beyond length are padding.
  m = np.asarray(mask)
  obs = np.asarray(eps.observation)
  for i in range(6):
    L = int(lens[i])
    np.testing.assert_array_equal(obs[i, :L, 0], np.arange(L))


def test_py_uniform_replay():
  buf = PyUniformReplayBuffer({"x": specs.ArraySpec((), np.int32)}, 8)
  for i in range(12):
    buf.add({"x": np.asarray(i, np.int32)})
  assert len(buf) == 8
  out = buf.sample(64, rng=np.random.RandomState(0))
  assert out["x"].min() >= 4  # ring keeps last 8
  seq = buf.sample(16, num_steps=2, rng=np.random.RandomState(1))
  np.testing.assert_array_equal(seq["x"][:, 1], seq["x"][:, 0] + 1)
  np.testing.assert_array_equal(buf.gather_all()["x"], np.arange(4, 12))


def test_py_hashed_replay_dedups():
  spec = {"observation": specs.ArraySpec((4,), np.uint8),
          "action": specs.ArraySpec((), np.int32)}
  buf = PyHashedReplayBuffer(spec, 16)
  frame = np.ones(4, np.uint8)
  for i in range(10):
    buf.add({"observation": frame, "action": np.asarray(i, np.int32)})
  assert buf.num_unique_observations == 1
  # Dedup actually saves memory: 10 frames, ONE stored copy (4 bytes).
  assert buf.observation_bytes_stored == 4
  # Sampling reconstructs observations from the pool.
  out = buf.sample(8, rng=np.random.RandomState(0))
  np.testing.assert_array_equal(out["observation"],
                                np.ones((8, 4), np.uint8))
  assert out["action"].max() < 10


def test_py_hashed_replay_distinct_frames_roundtrip():
  spec = {"observation": specs.ArraySpec((3,), np.uint8),
          "action": specs.ArraySpec((), np.int32)}
  buf = PyHashedReplayBuffer(spec, 8)
  for i in range(12):  # wraps the ring: 12 distinct frames, 8 live
    buf.add({"observation": np.full(3, i, np.uint8),
             "action": np.asarray(i, np.int32)})
  # Overwritten frames are EVICTED from the dedup pool (refcounted, like
  # the reference py_hashed_replay_buffer) — memory stays O(capacity),
  # not O(frames ever seen).
  assert buf.num_unique_observations == 8
  assert buf.observation_bytes_stored == 8 * 3
  out = buf.sample(32, rng=np.random.RandomState(1))
  # observation content must match the action written with it
  np.testing.assert_array_equal(
      out["observation"], np.repeat(out["action"].astype(np.uint8)[:, None],
                                    3, axis=1))
  ga = buf.gather_all()
  np.testing.assert_array_equal(ga["action"], np.arange(4, 12))
  np.testing.assert_array_equal(ga["observation"][:, 0],
                                np.arange(4, 12).astype(np.uint8))


def test_py_uniform_add_batch_vectorized_wraparound():
  spec = {"x": specs.ArraySpec((), np.int32)}
  buf = PyUniformReplayBuffer(spec, 10)
  buf.add_batch({"x": np.arange(6, dtype=np.int32)})
  buf.add_batch({"x": np.arange(6, 12, dtype=np.int32)})  # wraps
  np.testing.assert_array_equal(buf.gather_all()["x"], np.arange(2, 12))
  # batch larger than capacity keeps only the trailing `capacity` rows
  buf.add_batch({"x": np.arange(100, 125, dtype=np.int32)})
  np.testing.assert_array_equal(buf.gather_all()["x"], np.arange(115, 125))


def test_dataset_io_roundtrip(tmp_path):
  from agents_tpu.utils.dataset_io import (TrajectoryFileObserver,
                                           load_trajectory_dataset)
  obs = TrajectoryFileObserver(str(tmp_path / "ds"), SPEC,
                               frames_per_shard=4)
  frames = [_frame(2, t, t == 3) for t in range(6)]
  for f in frames:
    obs(f)
  obs.flush()
  shards = list(load_trajectory_dataset(str(tmp_path / "ds"), frames[0]))
  assert len(shards) == 2
  total = sum(s.action.shape[0] for s in shards)
  assert total == 6
  np.testing.assert_array_equal(np.asarray(shards[0].action[:, 0]),
                                [0, 1, 2, 3])


def test_dataset_to_replay(tmp_path):
  from agents_tpu.replay_buffers import UniformReplay
  from agents_tpu.utils.dataset_io import (TrajectoryFileObserver,
                                           dataset_to_replay)
  obs = TrajectoryFileObserver(str(tmp_path / "ds"), SPEC,
                               frames_per_shard=8)
  frames = [_frame(2, t, False) for t in range(8)]
  for f in frames:
    obs(f)
  obs.flush()
  replay = UniformReplay(SPEC, batch_size=2, max_length=32)
  state = dataset_to_replay(str(tmp_path / "ds"), frames[0], replay,
                            replay.init())
  assert int(state.count) == 8


def test_episodic_replay_ids_and_callbacks():
  from agents_tpu.replay_buffers.episodic_replay import CompletionCallback

  replay = EpisodicReplay(SPEC, batch_size=2, num_slots=8,
                          max_episode_len=5)
  state = replay.init()
  add = jax.jit(lambda s, f: replay.add_batch(s, f, return_completed=True))
  fired = []
  cb = CompletionCallback([fired.append])

  # Rows 0,1 open with episode ids 0,1.
  np.testing.assert_array_equal(
      np.asarray(state.episode_ids[:2]), [0, 1])
  state, done_ids = add(state, _frame(2, 0, False))
  assert cb(done_ids) == 0 and fired == []
  state, done_ids = add(state, _frame(2, 1, True))
  assert cb(done_ids) == 2
  assert fired == [0, 1]
  # Fresh episodes got ids 2,3.
  assert int(state.next_episode_id) == 4
  # Sampled info carries the completed episodes' ids.
  _, mask, info = replay.sample_episodes(
      state, jax.random.key(1), 4, return_info=True)
  ids = np.asarray(info["episode_ids"])
  assert set(ids).issubset({0, 1})
  np.testing.assert_array_equal(np.asarray(mask.sum(axis=1)), [2] * 4)


def test_episodic_replay_in_progress_sampling():
  replay = EpisodicReplay(SPEC, batch_size=2, num_slots=8,
                          max_episode_len=5)
  state = replay.init()
  add = jax.jit(replay.add_batch)
  # 3 frames, nothing completed.
  for t in range(3):
    state = add(state, _frame(2, t, False))
  assert int(state.num_completed) == 0
  # completed_only=True has nothing to return (all logits masked) —
  # in-progress sampling sees the open episodes at length 3.
  eps, mask, info = replay.sample_episodes(
      state, jax.random.key(0), 4, completed_only=False, return_info=True)
  np.testing.assert_array_equal(np.asarray(mask.sum(axis=1)), [3] * 4)
  obs = np.asarray(eps.observation)
  for i in range(4):
    np.testing.assert_array_equal(obs[i, :3, 0], np.arange(3))
  assert set(np.asarray(info["episode_ids"])).issubset({0, 1})


def test_episodic_replay_add_sequence():
  replay = EpisodicReplay(SPEC, batch_size=1, num_slots=4,
                          max_episode_len=6)
  state = replay.init()
  # Build a [T=4, ...] episode directly.
  T = 4
  seq = tj.Trajectory(
      step_type=jnp.asarray([0, 1, 1, 1], jnp.int32),
      observation=jnp.arange(T * 2, dtype=jnp.float32).reshape(T, 2),
      action=jnp.arange(T, dtype=jnp.int32),
      policy_info=(),
      next_step_type=jnp.asarray([1, 1, 1, 2], jnp.int32),
      reward=jnp.ones((T,)),
      discount=jnp.ones((T,)))
  state = jax.jit(replay.add_sequence)(state, seq)
  assert int(state.num_completed) == 1
  eps, mask, info = replay.sample_episodes(
      state, jax.random.key(0), 2, return_info=True)
  np.testing.assert_array_equal(np.asarray(mask.sum(axis=1)), [4, 4])
  obs = np.asarray(eps.observation)
  np.testing.assert_array_equal(obs[0, :4],
                                np.arange(8, dtype=np.float32).reshape(4, 2))
  # add_sequence consumed episode id 1 (row 0 holds id 0).
  assert set(np.asarray(info["episode_ids"])) == {1}


def test_py_uniform_interleaved_writer_stride():
  """writer_batch_size=B: multi-step windows must stay inside one env's
  stream even though B-env add_batch interleaves the ring (the round-4
  review finding: without the stride, half the 2-step windows paired
  env i's frame at t with env i+1's frame at t — cross-env
  next_observation)."""
  spec = {"env": specs.ArraySpec((), np.int32),
          "t": specs.ArraySpec((), np.int32)}
  buf = PyUniformReplayBuffer(spec, 64, writer_batch_size=4)
  for t in range(20):  # wraps the 64-slot ring at t=16
    buf.add_batch({"env": np.arange(4, dtype=np.int32),
                   "t": np.full(4, t, np.int32)})
  seq = buf.sample(256, num_steps=3, rng=np.random.RandomState(0))
  # every window: one env, consecutive timesteps
  np.testing.assert_array_equal(seq["env"][:, 1], seq["env"][:, 0])
  np.testing.assert_array_equal(seq["env"][:, 2], seq["env"][:, 0])
  np.testing.assert_array_equal(seq["t"][:, 1], seq["t"][:, 0] + 1)
  np.testing.assert_array_equal(seq["t"][:, 2], seq["t"][:, 0] + 2)
  # hashed variant shares the stride-aware index math
  hspec = {"observation": specs.ArraySpec((2,), np.uint8),
           "t": specs.ArraySpec((), np.int32)}
  hbuf = PyHashedReplayBuffer(hspec, 32, writer_batch_size=2)
  for t in range(12):
    hbuf.add_batch({"observation": np.stack(
        [np.full(2, t, np.uint8), np.full(2, 100 + t, np.uint8)]),
        "t": np.full(2, t, np.int32)})
  seq = hbuf.sample(64, num_steps=2, rng=np.random.RandomState(1))
  np.testing.assert_array_equal(seq["t"][:, 1], seq["t"][:, 0] + 1)
  same_env = (seq["observation"][:, 1, 0].astype(np.int32)
              - seq["observation"][:, 0, 0].astype(np.int32))
  np.testing.assert_array_equal(same_env, np.ones_like(same_env))
  # mismatched leading dim is rejected loudly
  import pytest
  with pytest.raises(ValueError):
    buf.add_batch({"env": np.arange(3, dtype=np.int32),
                   "t": np.zeros(3, np.int32)})
  with pytest.raises(ValueError):
    buf.add({"env": np.asarray(0, np.int32), "t": np.asarray(0, np.int32)})


def test_episodic_fresh_slot_skips_open_slots():
  """After the slot ring wraps, a completing row's fresh slot must skip
  slots still open for other rows AND just-committed slots (round-4
  review: a plain ring cursor interleaved two envs' frames into one
  slot)."""
  import jax

  # B=2, 8 slots; row 1 keeps one episode open for many of row 0's
  # completions so the cursor wraps past row 1's open slot.
  replay = EpisodicReplay(SPEC, batch_size=2, num_slots=8,
                          max_episode_len=4)
  state = replay.init()
  add = jax.jit(replay.add_batch)

  def frame(t, done_row0):
    # row 0 completes every other frame; row 1 never completes; row 1's
    # observations are offset by +100 to detect contamination.
    return tj.Trajectory(
        step_type=jnp.zeros(2, jnp.int32),
        observation=jnp.stack([jnp.full((2,), t),
                               jnp.full((2,), 100.0 + t)]),
        action=jnp.zeros(2, jnp.int32), policy_info=(),
        next_step_type=jnp.asarray([2 if done_row0 else 1, 1], jnp.int32),
        reward=jnp.zeros(2), discount=jnp.ones(2))

  for t in range(20):  # 10 completions for row 0 -> ring wraps (8 slots)
    state = add(state, frame(float(t), t % 2 == 1))
  # row 1's open slot must never have been reassigned to row 0
  open0, open1 = np.asarray(state.open_slot)
  assert open0 != open1
  # row 1's open episode content must be uncontaminated: its frames are
  # all >= 100 (written as 100+t).
  n1 = int(np.asarray(state.open_len)[1])
  row1_frames = np.asarray(state.storage.observation)[open1][:n1]
  assert n1 > 0 and np.all(row1_frames >= 100.0), row1_frames


def test_episodic_rejects_too_few_slots():
  import pytest
  spec = {"x": specs.ArraySpec((), np.float32)}
  with pytest.raises(ValueError):
    EpisodicReplay(spec, batch_size=4, num_slots=8, max_episode_len=4)
