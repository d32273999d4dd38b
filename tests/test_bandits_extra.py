"""Per-arm networks, mixture/dropout-TS/multi-objective/ranking agents."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from agents_tpu import networks as networks_lib
from agents_tpu import specs
from agents_tpu.bandits.agents import (DropoutThompsonSamplingAgent,
                                       GreedyMultiObjectiveNeuralAgent,
                                       MixtureAgent, RankingAgent,
                                       StaticMixtureAgent)
from agents_tpu.bandits.agents.neural_bandit_agents import (
    NeuralEpsilonGreedyAgent,)
from agents_tpu.bandits.multi_objective import LinearScalarizer
from agents_tpu.bandits.networks.global_and_arm_feature_network import (
    make_global_and_arm_feature_network,)
from agents_tpu.bandits.specs.bandit_spec_utils import (
    GLOBAL_FEATURE_KEY, PER_ARM_FEATURE_KEY,
    create_per_arm_observation_spec)
from agents_tpu.networks.network import Network
from agents_tpu.trajectories import time_step as ts
from agents_tpu.trajectories import trajectory as tj

K = 4
PER_ARM_SPEC = create_per_arm_observation_spec(3, 2, K)
TSS = ts.time_step_spec(PER_ARM_SPEC)
ACT = specs.BoundedArraySpec((), np.int32, 0, K - 1)


def _per_arm_obs(B):
  return {
      GLOBAL_FEATURE_KEY: jnp.ones((B, 3)),
      PER_ARM_FEATURE_KEY: jax.random.normal(jax.random.key(0), (B, K, 2)),
  }


def _bandit_traj(B, obs, action, reward):
  return tj.Trajectory(
      step_type=jnp.zeros((B,), jnp.int32), observation=obs,
      action=action, policy_info=(),
      next_step_type=jnp.full((B,), 2, jnp.int32), reward=reward,
      discount=jnp.ones((B,)))


def test_per_arm_network_shapes():
  net = make_global_and_arm_feature_network(PER_ARM_SPEC)
  params = net.init_params(jax.random.key(0), batch_size=2)
  out, _ = net.apply(params, _per_arm_obs(5))
  assert out.shape == (5, K)


def test_per_arm_greedy_agent_trains():
  net = make_global_and_arm_feature_network(PER_ARM_SPEC)
  agent = NeuralEpsilonGreedyAgent(TSS, ACT, net, optax.adam(1e-2),
                                   epsilon=0.1)
  state = agent.init(jax.random.key(0))
  traj = _bandit_traj(6, _per_arm_obs(6),
                      jnp.arange(6, dtype=jnp.int32) % K, jnp.ones((6,)))
  new_state, info = jax.jit(agent.train)(state, traj)
  assert np.isfinite(float(info.loss))


def test_mixture_agent():
  from agents_tpu.bandits.agents import BernoulliThompsonSamplingAgent, \
      Exp3Agent

  obs_spec = specs.BoundedArraySpec((1,), np.float32, 0, 1)
  tss = ts.time_step_spec(obs_spec)
  act = specs.BoundedArraySpec((), np.int32, 0, 2)
  a1 = BernoulliThompsonSamplingAgent(tss, act)
  a2 = Exp3Agent(tss, act)
  mix = StaticMixtureAgent(tss, act, [a1, a2])
  state = mix.init(jax.random.key(0))
  step = ts.restart(jnp.ones((4, 1)), batch_size=4)
  out = mix.collect_policy.action(mix.policy_params(state), step, (),
                                  jax.random.key(1))
  assert np.asarray(out.action).shape == (4,)
  traj = _bandit_traj(4, jnp.ones((4, 1)), np.asarray(out.action),
                      jnp.ones((4,)))
  new_state, info = mix.train(state, traj)
  assert int(new_state.train_step) == 1


def test_dropout_ts_agent():
  class DropNet(nn.Module):
    @nn.compact
    def __call__(self, obs, step_type=None, state=(), training=False):
      x = obs.astype(jnp.float32)
      x = nn.relu(nn.Dense(16)(x))
      x = nn.Dropout(0.3, deterministic=not training)(x)
      return nn.Dense(3)(x), state

  obs_spec = specs.ArraySpec((2,), np.float32)
  tss = ts.time_step_spec(obs_spec)
  act = specs.BoundedArraySpec((), np.int32, 0, 2)
  net = Network(DropNet(), obs_spec)
  agent = DropoutThompsonSamplingAgent(tss, act, net, optax.adam(1e-2))
  state = agent.init(jax.random.key(0))
  step = ts.restart(jnp.ones((8, 2)), batch_size=8)
  a1 = agent.collect_policy.action(state.params, step, (),
                                   jax.random.key(1))
  a2 = agent.collect_policy.action(state.params, step, (),
                                   jax.random.key(2))
  # Different dropout keys can yield different arms (stochastic TS).
  assert np.asarray(a1.action).shape == (8,)
  traj = _bandit_traj(8, jnp.ones((8, 2)), np.asarray(a1.action),
                      jnp.ones((8,)))
  _, info = jax.jit(agent.train)(state, traj)
  assert np.isfinite(float(info.loss))


def test_multi_objective_agent():
  obs_spec = specs.ArraySpec((2,), np.float32)
  tss = ts.time_step_spec(obs_spec)
  act = specs.BoundedArraySpec((), np.int32, 0, 2)
  nets = [networks_lib.make_q_network(obs_spec, act, fc_layer_params=(8,))
          for _ in range(2)]
  agent = GreedyMultiObjectiveNeuralAgent(
      tss, act, nets, LinearScalarizer([1.0, 0.5]), optax.adam(1e-2))
  state = agent.init(jax.random.key(0))
  step = ts.restart(jnp.ones((4, 2)), batch_size=4)
  out = agent.policy.action(agent.policy_params(state), step, (),
                            jax.random.key(1))
  assert np.asarray(out.action).shape == (4,)
  traj = _bandit_traj(4, jnp.ones((4, 2)), np.asarray(out.action),
                      jnp.ones((4, 2)))  # [B, num_objectives] rewards
  new_state, info = agent.train(state, traj)
  assert np.isfinite(float(info.loss))


def test_ranking_agent_slate():
  net = make_global_and_arm_feature_network(PER_ARM_SPEC)
  slate = 2
  act = specs.BoundedArraySpec((slate,), np.int32, 0, K - 1)
  agent = RankingAgent(ts.time_step_spec(PER_ARM_SPEC), act, net,
                       optax.adam(1e-2), slate_size=slate,
                       diversity_penalty=0.5)
  state = agent.init(jax.random.key(0))
  step = ts.restart(_per_arm_obs(3), batch_size=3)
  out = agent.policy.action(agent.policy_params(state), step, (),
                            jax.random.key(1))
  slate_arr = np.asarray(out.action)
  assert slate_arr.shape == (3, slate)
  # No repeated items within a slate.
  for row in slate_arr:
    assert len(set(row.tolist())) == slate
  traj = _bandit_traj(3, _per_arm_obs(3), jnp.asarray(slate_arr),
                      jnp.ones((3, slate)))
  _, info = jax.jit(agent.train)(state, traj)
  assert np.isfinite(float(info.loss))
