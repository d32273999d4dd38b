"""SAC / DDPG / TD3 agent contract tests (mirrors sac_agent_test.py etc.:
losses finite, params update, targets lag, policies act within spec)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from agents_tpu import networks, specs
from agents_tpu.agents.ddpg import DdpgAgent
from agents_tpu.agents.sac import SacAgent
from agents_tpu.agents.td3 import Td3Agent
from agents_tpu.trajectories import time_step as ts
from agents_tpu.trajectories import trajectory as tj

OBS_SPEC = specs.ArraySpec((3,), np.float32)
ACT_SPEC = specs.BoundedArraySpec((2,), np.float32, -1.0, 1.0)
TSS = ts.time_step_spec(OBS_SPEC)


def _experience(B=4, T=2):
  key = jax.random.key(0)
  return tj.Trajectory(
      step_type=jnp.zeros((B, T), jnp.int32),
      observation=jax.random.normal(key, (B, T, 3)),
      action=jnp.clip(jax.random.normal(key, (B, T, 2)), -1, 1),
      policy_info=(),
      next_step_type=jnp.ones((B, T), jnp.int32),
      reward=jnp.ones((B, T)),
      discount=jnp.ones((B, T)),
  )


def _sac():
  return SacAgent(
      TSS, ACT_SPEC,
      critic_network=networks.make_critic_network(
          OBS_SPEC, ACT_SPEC, joint_fc_layer_params=(32,)),
      actor_network=networks.make_sac_actor_network(
          OBS_SPEC, ACT_SPEC, fc_layer_params=(32,)),
      actor_optimizer=optax.adam(3e-4),
      critic_optimizer=optax.adam(3e-4),
      alpha_optimizer=optax.adam(3e-4),
      gamma=0.99)


def _ddpg():
  return DdpgAgent(
      TSS, ACT_SPEC,
      actor_network=networks.make_deterministic_actor_network(
          OBS_SPEC, ACT_SPEC, fc_layer_params=(32,)),
      critic_network=networks.make_critic_network(
          OBS_SPEC, ACT_SPEC, joint_fc_layer_params=(32,)),
      actor_optimizer=optax.adam(1e-3),
      critic_optimizer=optax.adam(1e-3),
      gamma=0.99, target_update_tau=0.05)


def _td3():
  return Td3Agent(
      TSS, ACT_SPEC,
      actor_network=networks.make_deterministic_actor_network(
          OBS_SPEC, ACT_SPEC, fc_layer_params=(32,)),
      critic_network=networks.make_critic_network(
          OBS_SPEC, ACT_SPEC, joint_fc_layer_params=(32,)),
      actor_optimizer=optax.adam(1e-3),
      critic_optimizer=optax.adam(1e-3),
      gamma=0.99, actor_update_period=2)


@pytest.mark.parametrize("make_agent", [_sac, _ddpg, _td3],
                         ids=["sac", "ddpg", "td3"])
def test_train_finite_and_updates(make_agent):
  agent = make_agent()
  state = agent.init(jax.random.key(0))
  new_state, info = jax.jit(agent.train)(state, _experience())
  assert np.isfinite(float(info.loss))
  # Critic always updates on step 1 (TD3's actor is delayed).
  crit_attr = "critic1_params" if hasattr(state, "critic1_params") else \
      "critic_params"
  before = jax.tree_util.tree_leaves(getattr(state, crit_attr))[0]
  after = jax.tree_util.tree_leaves(getattr(new_state, crit_attr))[0]
  assert not np.allclose(np.asarray(before), np.asarray(after))
  assert int(new_state.train_step) == 1


@pytest.mark.parametrize("make_agent", [_sac, _ddpg, _td3],
                         ids=["sac", "ddpg", "td3"])
def test_policies_within_spec(make_agent):
  agent = make_agent()
  state = agent.init(jax.random.key(0))
  step = ts.restart(jnp.zeros((5, 3)), batch_size=5)
  params = agent.policy_params(state)
  pol_state = agent.collect_policy.init_state(5)
  astep = agent.collect_policy.action(params, step, pol_state,
                                      jax.random.key(1))
  a = np.asarray(astep.action)
  assert a.shape == (5, 2)
  assert a.min() >= -1.0 - 1e-6 and a.max() <= 1.0 + 1e-6
  gstep = agent.policy.action(params, step, agent.policy.init_state(5),
                              jax.random.key(2))
  assert np.asarray(gstep.action).shape == (5, 2)


def test_sac_alpha_moves_toward_target_entropy():
  agent = _sac()
  state = agent.init(jax.random.key(0))
  exp = _experience(B=16)
  train = jax.jit(agent.train)
  for _ in range(3):
    state, info = train(state, exp)
  assert np.isfinite(float(state.log_alpha))
  assert float(state.log_alpha) != 0.0


def test_td3_delayed_actor_update():
  agent = _td3()  # actor_update_period=2
  state = agent.init(jax.random.key(0))
  train = jax.jit(agent.train)
  s1, _ = train(state, _experience())
  np.testing.assert_allclose(
      np.asarray(jax.tree_util.tree_leaves(s1.actor_params)[0]),
      np.asarray(jax.tree_util.tree_leaves(state.actor_params)[0]))
  s2, _ = train(s1, _experience())
  assert not np.allclose(
      np.asarray(jax.tree_util.tree_leaves(s2.actor_params)[0]),
      np.asarray(jax.tree_util.tree_leaves(s1.actor_params)[0]))


def test_sac_targets_polyak():
  agent = _sac()
  state = agent.init(jax.random.key(0))
  s1, _ = jax.jit(agent.train)(state, _experience())
  c_new = np.asarray(jax.tree_util.tree_leaves(s1.critic1_params)[0])
  t_old = np.asarray(jax.tree_util.tree_leaves(state.target_critic1_params)[0])
  t_new = np.asarray(jax.tree_util.tree_leaves(s1.target_critic1_params)[0])
  expected = 0.005 * c_new + 0.995 * t_old
  np.testing.assert_allclose(t_new, expected, rtol=1e-5)
