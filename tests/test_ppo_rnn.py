"""PPO with recurrent (LSTM) actor/value networks: sequence minibatching.

Mirrors the reference's RNN PPO path (ppo_agent with
actor_distribution_rnn_network; PPOLearner keeps sequences whole and
shuffles across them, train/ppo_learner.py:270-310).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from agents_tpu import metrics, networks, specs
from agents_tpu.agents.ppo import PPOAgent
from agents_tpu.environments.classic.cartpole import CartPole
from agents_tpu.environments.jax_environment import BatchedJaxEnv
from agents_tpu.train import OnPolicyTrainLoop
from agents_tpu.trajectories import time_step as ts

OBS_SPEC = specs.ArraySpec((4,), np.float32)
ACT_SPEC = specs.BoundedArraySpec((), np.int32, 0, 1)
TSS = ts.time_step_spec(OBS_SPEC)


def _ppo_rnn(**kw):
  kw.setdefault("num_epochs", 2)
  kw.setdefault("num_minibatches", 2)
  return PPOAgent(
      TSS, ACT_SPEC, optax.adam(1e-3),
      networks.make_actor_distribution_rnn_network(
          OBS_SPEC, ACT_SPEC, input_fc_layer_params=(8,), lstm_size=8,
          output_fc_layer_params=(8,)),
      networks.make_value_rnn_network(
          OBS_SPEC, input_fc_layer_params=(8,), lstm_size=8,
          output_fc_layer_params=(8,)), **kw)


def _rollout(agent, B=4, T=8, key=jax.random.key(0)):
  env = BatchedJaxEnv(CartPole(max_episode_steps=6), batch_size=B)
  loop = OnPolicyTrainLoop(env, agent, (), rollout_length=T)
  state = loop.init(key)
  params = agent.policy_params(state.agent_state)
  dstate, _, frames = loop.driver.run(params, state.driver_state, (),
                                      jax.random.key(2), T)
  return state, jax.tree_util.tree_map(
      lambda x: jnp.swapaxes(x, 0, 1), frames)


def test_ppo_rnn_agent_is_recurrent_and_policy_carries_state():
  agent = _ppo_rnn()
  assert agent._recurrent
  pstate = agent.collect_policy.init_state(3)
  actor_state, value_state = pstate
  assert actor_state[0].shape == (3, 8)
  state = agent.init(jax.random.key(0))
  step = ts.restart(jnp.zeros((3, 4)), batch_size=3)
  out = agent.collect_policy.action(
      agent.policy_params(state), step, pstate, jax.random.key(1))
  new_actor_state, new_value_state = out.state
  assert new_actor_state[0].shape == (3, 8)
  assert new_value_state[0].shape == (3, 8)
  assert out.info["value_prediction"].shape == (3,)


def test_ppo_rnn_sequence_train_runs_and_updates():
  agent = _ppo_rnn(num_epochs=3, num_minibatches=2)
  state, experience = _rollout(agent, B=4, T=8)
  # Sequence experience: [B, T] with per-step dists and values.
  assert experience.step_type.shape == (4, 8)
  new_state, info = jax.jit(agent.train)(state.agent_state, experience)
  assert np.isfinite(float(info.loss))
  before = jax.tree_util.tree_leaves(state.agent_state.actor_params)[0]
  after = jax.tree_util.tree_leaves(new_state.actor_params)[0]
  assert not np.allclose(np.asarray(before), np.asarray(after))


def test_ppo_rnn_minibatches_partition_sequences_not_frames():
  """num_minibatches must divide the batch (sequence) axis; a batch of 4
  sequences with 2 minibatches trains on [2, T-1] blocks, keeping time
  whole. With 3 minibatches (not dividing 4*7 frames either) the
  recurrent path raises at trace time via the reshape."""
  agent = _ppo_rnn(num_epochs=1, num_minibatches=2)
  state, experience = _rollout(agent, B=4, T=8)
  _, info = jax.jit(agent.train)(state.agent_state, experience)
  assert np.isfinite(float(info.loss))


def test_ppo_rnn_loop_learns_cartpole_smoke():
  env = BatchedJaxEnv(CartPole(), batch_size=8)
  agent = PPOAgent(
      env.time_step_spec(), env.action_spec(), optax.adam(1e-3),
      networks.make_actor_distribution_rnn_network(
          env.time_step_spec().observation, env.action_spec(),
          input_fc_layer_params=(32,), lstm_size=16,
          output_fc_layer_params=(32,)),
      networks.make_value_rnn_network(
          env.time_step_spec().observation, input_fc_layer_params=(32,),
          lstm_size=16, output_fc_layer_params=(32,)),
      num_epochs=4, num_minibatches=2, entropy_regularization=0.01)
  loop = OnPolicyTrainLoop(env, agent,
                           metrics.standard_collect_metrics(20),
                           rollout_length=48)
  state = jax.jit(loop.init)(jax.random.key(0))
  run = jax.jit(lambda s: loop.run(s, 15))
  state, _ = run(state)
  state, _ = run(state)
  ret = float(loop.metrics[2].result(state.metric_states[2]))
  assert ret > 35.0, f"PPO-RNN did not improve over random (~20): {ret}"
