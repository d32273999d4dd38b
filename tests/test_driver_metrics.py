"""Driver + metrics on a deterministic counting env (mirrors
drivers/*_test.py + metrics/tf_metrics_test.py fixtures, SURVEY §4)."""
import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from agents_tpu import metrics, specs
from agents_tpu.drivers import JaxDriver
from agents_tpu.environments.jax_environment import (BatchedJaxEnv,
                                                     JaxEnvironment)
from agents_tpu.policies import RandomPolicy
from agents_tpu.trajectories import time_step as ts


@struct.dataclass
class CountState:
  step: jax.Array


class CountingEnv(JaxEnvironment):
  """Deterministic: episode of length N, observation = step index, reward 1
  (analogue of environments/test_envs.py CountingEnv:32)."""

  def __init__(self, episode_len: int = 3):
    self.episode_len = episode_len

  def observation_spec(self):
    return specs.ArraySpec((), np.float32, "obs")

  def action_spec(self):
    return specs.BoundedArraySpec((), np.int32, 0, 1, "action")

  def reset(self, key):
    del key
    state = CountState(step=jnp.zeros((), jnp.int32))
    return state, ts.restart(jnp.zeros((), jnp.float32))

  def step(self, state, action, key):
    del action, key
    step = state.step + 1
    done = step >= self.episode_len
    return CountState(step=step), ts.TimeStep(
        step_type=jnp.where(done, ts.StepType.LAST,
                            ts.StepType.MID).astype(jnp.int32),
        reward=jnp.ones((), jnp.float32),
        discount=jnp.where(done, 0.0, 1.0).astype(jnp.float32),
        observation=step.astype(jnp.float32))


def _run_driver(num_steps, batch_size=2, episode_len=3):
  env = BatchedJaxEnv(CountingEnv(episode_len), batch_size=batch_size)
  policy = RandomPolicy(env.time_step_spec(), env.action_spec())
  ms = metrics.standard_collect_metrics(buffer_size=4)
  driver = JaxDriver(env, policy, observers=[m.update for m in ms],
                     return_trajectories=True)
  dstate = driver.init(jax.random.key(0))
  obs_states = tuple(m.init(batch_size) for m in ms)
  dstate, obs_states, frames = jax.jit(
      lambda d, o, k: driver.run(None, d, o, k, num_steps))(
          dstate, obs_states, jax.random.key(1))
  return ms, obs_states, frames


def test_driver_step_type_sequence():
  # episode_len=3: FIRST->MID, MID->MID, MID->LAST, boundary; repeat.
  _, _, frames = _run_driver(num_steps=8)
  st = np.asarray(frames.step_type)[:, 0]
  nst = np.asarray(frames.next_step_type)[:, 0]
  np.testing.assert_array_equal(st, [0, 1, 1, 2, 0, 1, 1, 2])
  np.testing.assert_array_equal(nst, [1, 1, 2, 0, 1, 1, 2, 0])


def test_environment_steps_excludes_boundary():
  ms, obs_states, _ = _run_driver(num_steps=8)
  results = {m.name: m.result(s) for m, s in zip(ms, obs_states)}
  # 8 frames x 2 rows = 16; boundaries: each episode cycle of 4 frames has
  # 1 boundary -> 2 boundaries per row -> 4 total.
  assert int(results["EnvironmentSteps"]) == 12
  assert int(results["NumberOfEpisodes"]) == 4


def test_average_return_and_length():
  ms, obs_states, _ = _run_driver(num_steps=8)
  results = {m.name: m.result(s) for m, s in zip(ms, obs_states)}
  # Each episode: rewards at MID,LAST frames -> return 3.0 over 3 steps.
  assert results["AverageReturn"] == 3.0
  assert results["AverageEpisodeLength"] == 3.0


def test_policy_state_auto_reset():
  from agents_tpu.policies import ScriptedPolicy
  env = BatchedJaxEnv(CountingEnv(3), batch_size=1)
  script = jnp.zeros((10,), jnp.int32)
  policy = ScriptedPolicy(env.time_step_spec(), env.action_spec(), script)
  state0 = policy.init_state(1)
  step1 = policy.action(None, ts.restart(jnp.zeros((1,)), batch_size=1),
                        state0, jax.random.key(0))
  assert int(step1.state[0]) == 1
  # A FIRST time step must reset the counter state to zero before use.
  step2 = policy.action(None, ts.restart(jnp.zeros((1,)), batch_size=1),
                        jnp.asarray([7], jnp.int32), jax.random.key(0))
  assert int(step2.state[0]) == 1  # 0 (reset) + 1


def test_average_return_multi_metric():
  """Vector rewards: per-component episode returns (tf_metrics.py:394)."""
  import jax
  import jax.numpy as jnp
  import numpy as np
  from agents_tpu.metrics.jax_metrics import AverageReturnMultiMetric
  from agents_tpu.trajectories import trajectory as tj

  m = AverageReturnMultiMetric(reward_len=2, buffer_size=4)
  state = m.init(batch_size=2)

  def frame(reward, next_step_type, step_type=1):
    B = len(reward)
    return tj.Trajectory(
        step_type=jnp.full((B,), step_type, jnp.int32),
        observation=jnp.zeros((B, 1)),
        action=jnp.zeros((B,), jnp.int32), policy_info=(),
        next_step_type=jnp.asarray(next_step_type, jnp.int32),
        reward=jnp.asarray(reward, jnp.float32),
        discount=jnp.ones((B,)))

  # Two-step episodes per row; row0 returns (1+2, 10+20), row1 (3+4, 5+6).
  state = m.update(state, frame([[1., 10.], [3., 5.]], [1, 1]))
  state = m.update(state, frame([[2., 20.], [4., 6.]], [2, 2]))
  res = np.asarray(m.result(state))
  np.testing.assert_allclose(res, [(3. + 7.) / 2, (30. + 11.) / 2])


def test_profiling_timer_and_annotate():
  import time as _time
  from agents_tpu.utils import profiling

  t = profiling.Timer()
  with t:
    _time.sleep(0.01)
  with t:
    _time.sleep(0.01)
  assert t.laps() == 2
  assert 0.015 < t.value() < 1.0
  t.reset()
  assert t.value() == 0.0 and t.laps() == 0
  # annotation is a no-op wrapper host-side
  with profiling.annotate("test-span"):
    pass


def test_metrics_group_state_roundtrip():
  import numpy as np
  from agents_tpu.eval.metric_utils import MetricsGroup
  from agents_tpu.metrics import py_metrics
  from agents_tpu.trajectories import trajectory as tj
  import jax.numpy as jnp

  def frame(reward, next_step_type):
    B = len(reward)
    return tj.Trajectory(
        step_type=jnp.ones((B,), jnp.int32),
        observation=jnp.zeros((B, 1)),
        action=jnp.zeros((B,), jnp.int32), policy_info=(),
        next_step_type=jnp.asarray(next_step_type, jnp.int32),
        reward=jnp.asarray(reward, jnp.float32),
        discount=jnp.ones((B,)))

  g = MetricsGroup([py_metrics.AverageReturnMetric(5),
                    py_metrics.EnvironmentSteps()])
  g.metrics[0](frame([1.0, 2.0], [2, 2]))
  g.metrics[1](frame([1.0, 2.0], [2, 2]))
  snap = g.state_dict()
  before = g.results()

  g2 = MetricsGroup([py_metrics.AverageReturnMetric(5),
                     py_metrics.EnvironmentSteps()])
  g2.load_state_dict(snap)
  after = g2.results()
  assert before == after and before["AverageReturn"] == 1.5
