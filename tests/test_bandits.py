"""Bandits vertical tests (mirrors tf_agents/bandits/**/*_test.py
contracts: linalg correctness, LinUCB learns, regret decreases,
scalarizers)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from agents_tpu import networks
from agents_tpu.bandits.agents import (BernoulliThompsonSamplingAgent,
                                       Exp3Agent, LinUcbAgent,
                                       LinearThompsonSamplingAgent,
                                       NeuralEpsilonGreedyAgent,
                                       NeuralFalconAgent, NeuralLinUcbAgent)
from agents_tpu.bandits.environments import (BernoulliBandit,
                                             StationaryStochasticBandit,
                                             WheelBandit)
from agents_tpu.bandits.metrics import RegretMetric, SuboptimalArmsMetric
from agents_tpu.bandits.multi_objective import (ChebyshevScalarizer,
                                                HyperVolumeScalarizer,
                                                LinearScalarizer)
from agents_tpu.bandits.policies import (conjugate_gradient,
                                         simplified_woodbury_update)
from agents_tpu.environments.jax_environment import BatchedJaxEnv
from agents_tpu.metrics import jax_metrics
from agents_tpu.train import OnPolicyTrainLoop

THETA = np.array([[1.0, 0.0], [0.0, 1.0], [-1.0, -1.0]], np.float32)


def _env(B=32, noise=0.05):
  return BatchedJaxEnv(
      StationaryStochasticBandit(THETA, noise_std=noise), batch_size=B)


def test_conjugate_gradient_solves():
  rng = np.random.RandomState(0)
  m = rng.randn(6, 6)
  a = m @ m.T + 6 * np.eye(6)
  b = rng.randn(6)
  x = conjugate_gradient(jnp.asarray(a, jnp.float32),
                         jnp.asarray(b, jnp.float32))
  np.testing.assert_allclose(np.asarray(a @ np.asarray(x)), b, atol=1e-3)


def test_woodbury_update():
  rng = np.random.RandomState(1)
  a = np.eye(3) * 2.0
  x = rng.randn(3).astype(np.float32)
  a_inv_updated = simplified_woodbury_update(
      jnp.asarray(np.linalg.inv(a), jnp.float32), jnp.asarray(x))
  direct = np.linalg.inv(a + np.outer(x, x))
  np.testing.assert_allclose(np.asarray(a_inv_updated), direct, atol=1e-5)


def _run_bandit(agent, env, iterations=30):
  jenv = env.env
  metrics = (RegretMetric(jenv.optimal_reward_fn),
             SuboptimalArmsMetric(jenv.optimal_action_fn))
  loop = OnPolicyTrainLoop(env, agent, metrics, rollout_length=2)
  state = loop.init(jax.random.key(0))
  run = jax.jit(lambda s, n: loop.run(s, n), static_argnums=1)
  state, _ = run(state, iterations)
  early = {m.name: float(m.result(s))
           for m, s in zip(metrics, state.metric_states)}
  # Fresh metric states to measure late-phase regret only.
  state = state.replace(metric_states=tuple(
      m.init(env.batch_size) for m in metrics))
  state, _ = run(state, iterations)
  late = {m.name: float(m.result(s))
          for m, s in zip(metrics, state.metric_states)}
  return early, late


def test_linucb_regret_decreases():
  agent = LinUcbAgent(_env().time_step_spec(), _env().action_spec(),
                      alpha=1.0)
  early, late = _run_bandit(agent, _env())
  assert late["RegretMetric"] < early["RegretMetric"]
  assert late["SuboptimalArmsMetric"] < 0.35


def test_lints_learns():
  agent = LinearThompsonSamplingAgent(
      _env().time_step_spec(), _env().action_spec(), alpha=0.5)
  early, late = _run_bandit(agent, _env())
  assert late["SuboptimalArmsMetric"] < 0.5


def test_neural_eps_greedy_learns():
  env = _env()
  net = networks.make_q_network(
      env.time_step_spec().observation, env.action_spec(),
      fc_layer_params=(32,))
  agent = NeuralEpsilonGreedyAgent(
      env.time_step_spec(), env.action_spec(), net, optax.adam(1e-2),
      epsilon=0.1)
  early, late = _run_bandit(agent, env, iterations=60)
  assert late["RegretMetric"] < early["RegretMetric"] + 0.05


def test_falcon_runs():
  env = _env()
  net = networks.make_q_network(
      env.time_step_spec().observation, env.action_spec(),
      fc_layer_params=(16,))
  agent = NeuralFalconAgent(
      env.time_step_spec(), env.action_spec(), net, optax.adam(1e-2))
  # Falcon's collect policy needs train_step in params.
  state = agent.init(jax.random.key(0))
  from agents_tpu.trajectories import time_step as ts
  step = ts.restart(jnp.zeros((4, 2)), batch_size=4)
  a = agent.collect_policy.action(
      agent.collect_policy_params(state), step, (), jax.random.key(1))
  assert np.asarray(a.action).shape == (4,)


def test_bernoulli_ts_finds_best_arm():
  env = BatchedJaxEnv(BernoulliBandit([0.1, 0.8, 0.3]), batch_size=16)
  agent = BernoulliThompsonSamplingAgent(env.time_step_spec(),
                                         env.action_spec())
  loop = OnPolicyTrainLoop(env, agent, (), rollout_length=2)
  state = loop.init(jax.random.key(0))
  run = jax.jit(lambda s: loop.run(s, 40))
  state, _ = run(state)
  ag = state.agent_state
  means = np.asarray(ag.alpha / (ag.alpha + ag.beta))
  assert np.argmax(means) == 1


def test_exp3_prefers_best_arm():
  env = BatchedJaxEnv(BernoulliBandit([0.2, 0.9]), batch_size=8)
  agent = Exp3Agent(env.time_step_spec(), env.action_spec(),
                    learning_rate=0.01)
  loop = OnPolicyTrainLoop(env, agent, (), rollout_length=2)
  state = loop.init(jax.random.key(0))
  state, _ = jax.jit(lambda s: loop.run(s, 50))(state)
  w = np.asarray(state.agent_state.log_weights)
  assert w[1] > w[0]


def test_neural_linucb_runs():
  env = _env(B=8)
  enc = networks.make_encoding_network(
      env.time_step_spec().observation, fc_layer_params=(8,))
  agent = NeuralLinUcbAgent(env.time_step_spec(), env.action_spec(), enc,
                            encoding_dim=8, optimizer=optax.adam(1e-2),
                            encoding_phase_steps=5)
  loop = OnPolicyTrainLoop(env, agent, (), rollout_length=2)
  state = loop.init(jax.random.key(0))
  state, losses = jax.jit(lambda s: loop.run(s, 10))(state)
  assert np.isfinite(np.asarray(losses)).all()
  assert int(state.agent_state.train_step) == 10


def test_wheel_bandit_env():
  env = BatchedJaxEnv(WheelBandit(), batch_size=4)
  state, step = env.reset(jax.random.key(0))
  obs = np.asarray(step.observation)
  assert (obs**2).sum(-1).max() <= 1.0 + 1e-5


def test_scalarizers():
  m = jnp.array([[1.0, 2.0], [3.0, 1.0]])
  lin = LinearScalarizer([1.0, 0.5])
  np.testing.assert_allclose(np.asarray(lin(m)), [2.0, 3.5])
  cheb = ChebyshevScalarizer([1.0, 1.0], [0.0, 0.0])
  np.testing.assert_allclose(np.asarray(cheb(m)), [1.0, 1.0])
  hv = HyperVolumeScalarizer([1.0, 1.0])
  np.testing.assert_allclose(np.asarray(hv(m)),
                             [np.sqrt(2), np.sqrt(2)], rtol=1e-5)
  with pytest.raises(ValueError):
    LinearScalarizer([1.0])
