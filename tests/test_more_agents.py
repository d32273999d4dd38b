"""C51 / BC / CQL-SAC / QtOpt / Random agent tests."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from agents_tpu import networks, specs
from agents_tpu.agents.behavioral_cloning import BehavioralCloningAgent
from agents_tpu.agents.categorical_dqn import (CategoricalDqnAgent,
                                               project_distribution)
from agents_tpu.agents.cql import CqlSacAgent
from agents_tpu.agents.qtopt import QtOptAgent
from agents_tpu.agents.random import RandomAgent
from agents_tpu.trajectories import time_step as ts
from agents_tpu.trajectories import trajectory as tj

OBS = specs.ArraySpec((3,), np.float32)
TSS = ts.time_step_spec(OBS)
DISC_ACT = specs.BoundedArraySpec((), np.int32, 0, 1)
CONT_ACT = specs.BoundedArraySpec((2,), np.float32, -1.0, 1.0)


def _traj(action_spec, B=4, T=2):
  key = jax.random.key(0)
  if specs.is_discrete(action_spec):
    action = jnp.zeros((B, T), jnp.int32)
  else:
    action = jnp.clip(jax.random.normal(key, (B, T) + action_spec.shape),
                      -1, 1)
  return tj.Trajectory(
      step_type=jnp.zeros((B, T), jnp.int32),
      observation=jax.random.normal(key, (B, T, 3)),
      action=action, policy_info=(),
      next_step_type=jnp.ones((B, T), jnp.int32),
      reward=jnp.ones((B, T)), discount=jnp.ones((B, T)))


def test_project_distribution_identity():
  support = jnp.linspace(-1.0, 1.0, 5)
  weights = jnp.array([[0.1, 0.2, 0.4, 0.2, 0.1]])
  out = project_distribution(jnp.broadcast_to(support, (1, 5)), weights,
                             support)
  np.testing.assert_allclose(np.asarray(out), np.asarray(weights),
                             atol=1e-6)


def test_project_distribution_shift_and_clip():
  support = jnp.linspace(0.0, 4.0, 5)  # dz = 1
  weights = jnp.array([[1.0, 0.0, 0.0, 0.0, 0.0]])
  # Shift atom 0 to 2.5 -> mass splits between atoms 2 and 3.
  shifted = jnp.array([[2.5, 0.0, 0.0, 0.0, 0.0]])
  # Only first source atom carries mass.
  out = project_distribution(shifted, weights, support)
  np.testing.assert_allclose(np.asarray(out[0, 2]), 0.5, atol=1e-6)
  np.testing.assert_allclose(np.asarray(out[0, 3]), 0.5, atol=1e-6)
  # Out-of-range atoms clip to the edges.
  out2 = project_distribution(jnp.array([[99.0, 0, 0, 0, 0]]), weights,
                              support)
  np.testing.assert_allclose(np.asarray(out2[0, 4]), 1.0, atol=1e-6)


def test_c51_train():
  net = networks.make_categorical_q_network(OBS, DISC_ACT, num_atoms=11,
                                            fc_layer_params=(16,))
  agent = CategoricalDqnAgent(TSS, DISC_ACT, net, optax.adam(1e-3),
                              min_q_value=-5, max_q_value=5, gamma=0.99)
  state = agent.init(jax.random.key(0))
  new_state, info = jax.jit(agent.train)(state, _traj(DISC_ACT))
  assert np.isfinite(float(info.loss))
  step = ts.restart(jnp.zeros((2, 3)), batch_size=2)
  a = agent.policy.action(agent.policy_params(new_state), step, (),
                          jax.random.key(1))
  assert np.asarray(a.action).shape == (2,)


def test_bc_distribution_and_q():
  anet = networks.make_actor_distribution_network(OBS, CONT_ACT,
                                                  fc_layer_params=(16,))
  agent = BehavioralCloningAgent(TSS, CONT_ACT, anet, optax.adam(1e-3))
  state = agent.init(jax.random.key(0))
  _, info = jax.jit(agent.train)(state, _traj(CONT_ACT))
  assert np.isfinite(float(info.loss))

  qnet = networks.make_q_network(OBS, DISC_ACT, fc_layer_params=(16,))
  agent2 = BehavioralCloningAgent(TSS, DISC_ACT, qnet, optax.adam(1e-3),
                                  network_is_distribution=False)
  s2 = agent2.init(jax.random.key(0))
  _, info2 = jax.jit(agent2.train)(s2, _traj(DISC_ACT))
  assert np.isfinite(float(info2.loss))


def test_cql_sac_train():
  agent = CqlSacAgent(
      TSS, CONT_ACT,
      critic_network=networks.make_critic_network(
          OBS, CONT_ACT, joint_fc_layer_params=(16,)),
      actor_network=networks.make_sac_actor_network(
          OBS, CONT_ACT, fc_layer_params=(16,)),
      actor_optimizer=optax.adam(3e-4), critic_optimizer=optax.adam(3e-4),
      alpha_optimizer=optax.adam(3e-4), gamma=0.99,
      cql_alpha=1.0, num_cql_samples=4)
  state = agent.init(jax.random.key(0))
  new_state, info = jax.jit(agent.train)(state, _traj(CONT_ACT))
  assert np.isfinite(float(info.loss))
  assert np.isfinite(float(info.extra.cql_loss))
  # CQL regularizer should push data-Q relative to sampled-Q; just check
  # params moved.
  assert not np.allclose(
      np.asarray(jax.tree_util.tree_leaves(state.critic1_params)[0]),
      np.asarray(jax.tree_util.tree_leaves(new_state.critic1_params)[0]))


def test_qtopt_train_and_cem_policy():
  qnet = networks.make_critic_network(OBS, CONT_ACT,
                                      joint_fc_layer_params=(16,))
  agent = QtOptAgent(TSS, CONT_ACT, qnet, optax.adam(1e-3), gamma=0.99,
                     cem_num_samples=8, cem_num_elites=2,
                     cem_num_iterations=2)
  state = agent.init(jax.random.key(0))
  new_state, info = jax.jit(agent.train)(state, _traj(CONT_ACT))
  assert np.isfinite(float(info.loss))
  step = ts.restart(jnp.zeros((3, 3)), batch_size=3)
  a = agent.policy.action(agent.policy_params(new_state), step, (),
                          jax.random.key(1))
  arr = np.asarray(a.action)
  assert arr.shape == (3, 2)
  assert arr.min() >= -1.0 and arr.max() <= 1.0


def test_random_agent():
  agent = RandomAgent(TSS, DISC_ACT)
  state = agent.init(jax.random.key(0))
  new_state, info = agent.train(state, None)
  assert int(new_state.train_step) == 1
  step = ts.restart(jnp.zeros((2, 3)), batch_size=2)
  a = agent.policy.action((), step, (), jax.random.key(0))
  assert set(np.asarray(a.action)).issubset({0, 1})
