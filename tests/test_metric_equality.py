"""Device metrics == host metrics on identical trajectories (mirrors
tf_agents/metrics/metric_equality_test.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from agents_tpu.metrics import jax_metrics, py_metrics
from agents_tpu.trajectories import trajectory as tj


def _frames():
  """Two env rows, 8 frames: row cycles FIRST,MID,MID->LAST,boundary."""
  st = np.array([[0, 1, 1, 2, 0, 1, 1, 2], [0, 1, 2, 0, 1, 2, 0, 1]]).T
  nst = np.array([[1, 1, 2, 0, 1, 1, 2, 0], [1, 2, 0, 1, 2, 0, 1, 2]]).T
  reward = np.where(st == 2, 0.0, 1.0).astype(np.float32)
  frames = []
  for t in range(8):
    frames.append(tj.Trajectory(
        step_type=st[t].astype(np.int32), observation=np.zeros(2),
        action=np.zeros(2, np.int32), policy_info=(),
        next_step_type=nst[t].astype(np.int32),
        reward=reward[t], discount=np.ones(2, np.float32)))
  return frames


def test_metric_equality():
  frames = _frames()

  jm = [jax_metrics.EnvironmentSteps(), jax_metrics.NumberOfEpisodes(),
        jax_metrics.AverageReturnMetric(10),
        jax_metrics.AverageEpisodeLengthMetric(10)]
  jm_states = [m.init(2) for m in jm]
  for f in frames:
    fj = jax.tree_util.tree_map(jnp.asarray, f)
    jm_states = [m.update(s, fj) for m, s in zip(jm, jm_states)]
  j_results = {m.name: float(m.result(s)) for m, s in zip(jm, jm_states)}

  pm = [py_metrics.EnvironmentSteps(), py_metrics.NumberOfEpisodes(),
        py_metrics.AverageReturnMetric(10),
        py_metrics.AverageEpisodeLengthMetric(10)]
  for f in frames:
    for m in pm:
      m(f)
  p_results = {m.name: float(m.result()) for m in pm}

  assert set(j_results) == set(p_results)
  for k in j_results:
    np.testing.assert_allclose(j_results[k], p_results[k], rtol=1e-6,
                               err_msg=k)


def test_deque_push_batch_overflow_keeps_most_recent():
  """One push_batch with more masked-in rows than capacity must keep the
  LAST `capacity` rows deterministically (round-4 review: duplicate
  scatter indices let XLA keep an arbitrary subset)."""
  import jax.numpy as jnp

  from agents_tpu.metrics.jax_metrics import DequeState

  dq = DequeState(data=jnp.zeros(4), count=jnp.zeros((), jnp.int32))
  values = jnp.arange(10.0)
  dq = dq.push_batch(jnp.ones(10, bool), values)
  kept = sorted(np.asarray(dq.data).tolist())
  assert kept == [6.0, 7.0, 8.0, 9.0], kept
  assert int(dq.count) == 10
