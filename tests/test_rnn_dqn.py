"""Recurrent DQN sequence-training test (q_rnn_network path)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from agents_tpu import networks, specs
from agents_tpu.agents.dqn import DqnAgent
from agents_tpu.trajectories import time_step as ts
from agents_tpu.trajectories import trajectory as tj
from agents_tpu.utils import common

OBS = specs.ArraySpec((3,), np.float32)
TSS = ts.time_step_spec(OBS)
ACT = specs.BoundedArraySpec((), np.int32, 0, 1)


def test_rnn_dqn_sequence_train():
  qrnn = networks.make_q_rnn_network(OBS, ACT, input_fc_layer_params=(8,),
                                     lstm_size=8,
                                     output_fc_layer_params=(8,))
  agent = DqnAgent(TSS, ACT, qrnn, optax.adam(1e-3), gamma=0.9,
                   td_errors_loss_fn=common.element_wise_squared_loss,
                   train_sequence_length=6)
  assert agent.train_sequence_length == 6
  state = agent.init(jax.random.key(0))
  B, T = 3, 6
  exp = tj.Trajectory(
      step_type=jnp.tile(jnp.array([0, 1, 1, 2, 0, 1]), (B, 1)),
      observation=jax.random.normal(jax.random.key(1), (B, T, 3)),
      action=jnp.zeros((B, T), jnp.int32),
      policy_info=(),
      next_step_type=jnp.tile(jnp.array([1, 1, 2, 0, 1, 1]), (B, 1)),
      reward=jnp.ones((B, T)),
      discount=jnp.tile(jnp.array([1., 1., 0., 1., 1., 1.]), (B, 1)),
  )
  new_state, info = jax.jit(agent.train)(state, exp)
  assert np.isfinite(float(info.loss))
  # Boundary frame (index 3, step_type LAST) contributes no loss.
  np.testing.assert_allclose(np.asarray(info.extra.td_loss)[:, 3], 0.0)
  assert not np.allclose(
      np.asarray(jax.tree_util.tree_leaves(state.q_params)[0]),
      np.asarray(jax.tree_util.tree_leaves(new_state.q_params)[0]))


def test_rnn_policy_action_carries_state():
  qrnn = networks.make_q_rnn_network(OBS, ACT, lstm_size=8)
  agent = DqnAgent(TSS, ACT, qrnn, optax.adam(1e-3),
                   train_sequence_length=4)
  state = agent.init(jax.random.key(0))
  pol_state = agent.policy.init_state(2)
  step = ts.restart(jnp.zeros((2, 3)), batch_size=2)
  out = agent.policy.action(agent.policy_params(state), step, pol_state,
                            jax.random.key(1))
  assert out.state[0].shape == (2, 8)


def test_rnn_ddqn_decouples_argmax_from_target_eval():
  """Recurrent Double-DQN must use online-argmax/target-eval (the
  round-4 review found the sequence path silently fell back to vanilla
  max-target). Crafted [B, T, A] tables where the online argmax picks a
  DIFFERENT action than the target max."""
  from agents_tpu.agents.dqn import DdqnAgent, DqnAgent

  qrnn = networks.make_q_rnn_network(OBS, ACT, input_fc_layer_params=(4,),
                                     lstm_size=4)
  ddqn = DdqnAgent(TSS, ACT, qrnn, optax.adam(1e-3))
  dqn = DqnAgent(TSS, ACT, qrnn, optax.adam(1e-3))
  online = jnp.asarray([[[5.0, 1.0], [5.0, 1.0]]])   # argmax -> action 0
  target = jnp.asarray([[[2.0, 9.0], [2.0, 9.0]]])   # max    -> action 1
  # DDQN: evaluate target at ONLINE argmax (action 0) -> 2.0
  np.testing.assert_allclose(
      np.asarray(ddqn._seq_next_best_q(online, target, None)), 2.0)
  # vanilla DQN: target max -> 9.0
  np.testing.assert_allclose(
      np.asarray(dqn._seq_next_best_q(online, target, None)), 9.0)
  # action-mask kills the argmax/max candidates
  mask = jnp.asarray([[[False, True], [False, True]]])
  np.testing.assert_allclose(
      np.asarray(ddqn._seq_next_best_q(online, target, mask)), 9.0)
  np.testing.assert_allclose(
      np.asarray(dqn._seq_next_best_q(online, target, mask)), 9.0)


def test_rnn_dqn_sequence_loss_applies_splitter():
  """Recurrent DQN with observation_and_action_constraint_splitter: the
  mask must reach the network-input split and the target max (the review
  found the sequence path fed the raw composite observation)."""
  from agents_tpu.specs import array_spec

  obs_spec = {"obs": OBS,
              "mask": array_spec.ArraySpec((2,), np.bool_)}
  tss = ts.time_step_spec(obs_spec)
  qrnn = networks.make_q_rnn_network(OBS, ACT, input_fc_layer_params=(4,),
                                     lstm_size=4)
  agent = DqnAgent(
      TSS.replace(observation=obs_spec) if hasattr(TSS, "replace") else tss,
      ACT, qrnn, optax.adam(1e-3),
      observation_and_action_constraint_splitter=lambda o: (o["obs"],
                                                            o["mask"]),
      train_sequence_length=4)
  state = agent.init(jax.random.key(0))
  B, T = 2, 4
  exp = tj.Trajectory(
      step_type=jnp.tile(jnp.array([0, 1, 1, 1]), (B, 1)),
      observation={
          "obs": jax.random.normal(jax.random.key(1), (B, T, 3)),
          "mask": jnp.ones((B, T, 2), bool)},
      action=jnp.zeros((B, T), jnp.int32),
      policy_info=(),
      next_step_type=jnp.tile(jnp.array([1, 1, 1, 2]), (B, 1)),
      reward=jnp.ones((B, T)),
      discount=jnp.ones((B, T)),
  )
  _, info = jax.jit(agent.train)(state, exp)
  assert np.isfinite(float(info.loss))
