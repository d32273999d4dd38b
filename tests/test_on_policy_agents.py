"""PPO / REINFORCE tests (mirrors ppo_agent_test.py / reinforce_agent_test.py
contracts: advantages math, masking, training loop learns)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from agents_tpu import metrics, networks, specs
from agents_tpu.agents.ppo import PPOAgent
from agents_tpu.agents.reinforce import ReinforceAgent
from agents_tpu.environments.classic.cartpole import CartPole
from agents_tpu.environments.jax_environment import BatchedJaxEnv
from agents_tpu.train import OnPolicyTrainLoop
from agents_tpu.trajectories import time_step as ts

OBS_SPEC = specs.ArraySpec((4,), np.float32)
ACT_SPEC = specs.BoundedArraySpec((), np.int32, 0, 1)
TSS = ts.time_step_spec(OBS_SPEC)


def _ppo(**kw):
  kw.setdefault("num_epochs", 2)
  kw.setdefault("num_minibatches", 1)
  return PPOAgent(
      TSS, ACT_SPEC, optax.adam(1e-3),
      networks.make_actor_distribution_network(
          OBS_SPEC, ACT_SPEC, fc_layer_params=(16,)),
      networks.make_value_network(OBS_SPEC, fc_layer_params=(16,)), **kw)


def _rollout(agent, B=4, T=8, key=jax.random.key(0)):
  env = BatchedJaxEnv(CartPole(max_episode_steps=6), batch_size=B)
  loop = OnPolicyTrainLoop(env, agent, (), rollout_length=T)
  state = loop.init(key)
  params = agent.policy_params(state.agent_state)
  dstate, _, frames = loop.driver.run(params, state.driver_state, (),
                                      jax.random.key(2), T)
  return state, jax.tree_util.tree_map(
      lambda x: jnp.swapaxes(x, 0, 1), frames)


def test_ppo_train_runs_and_updates():
  agent = _ppo()
  state, experience = _rollout(agent)
  new_agent_state, info = jax.jit(agent.train)(
      state.agent_state, experience)
  assert np.isfinite(float(info.loss))
  before = jax.tree_util.tree_leaves(state.agent_state.actor_params)[0]
  after = jax.tree_util.tree_leaves(new_agent_state.actor_params)[0]
  assert not np.allclose(np.asarray(before), np.asarray(after))
  # normalizer state advanced
  c0 = jax.tree_util.tree_leaves(state.agent_state.obs_norm_state.count)[0]
  c1 = jax.tree_util.tree_leaves(new_agent_state.obs_norm_state.count)[0]
  assert float(np.asarray(c1).ravel()[0]) > float(np.asarray(c0).ravel()[0])


def test_ppo_gae_matches_value_ops():
  agent = _ppo(normalize_rewards=False)
  state, experience = _rollout(agent)
  returns, advantages = agent.compute_return_and_advantage(
      state.agent_state, experience)
  # TD-lambda return identity: returns = advantages + values[:, :-1]
  values = experience.policy_info["value_prediction"]
  np.testing.assert_allclose(
      np.asarray(returns), np.asarray(advantages + values[:, :-1]),
      rtol=1e-5)


def test_ppo_minibatch_epochs():
  agent = _ppo(num_epochs=3, num_minibatches=2)
  state, experience = _rollout(agent, B=4, T=8)
  new_state, info = jax.jit(agent.train)(state.agent_state, experience)
  assert np.isfinite(float(info.loss))


def test_reinforce_train_runs():
  agent = ReinforceAgent(
      TSS, ACT_SPEC,
      networks.make_actor_distribution_network(
          OBS_SPEC, ACT_SPEC, fc_layer_params=(16,)),
      optax.adam(1e-3),
      value_network=networks.make_value_network(
          OBS_SPEC, fc_layer_params=(16,)),
      gamma=0.99)
  state, experience = _rollout(agent)
  new_state, info = jax.jit(agent.train)(state.agent_state, experience)
  assert np.isfinite(float(info.loss))
  assert not np.allclose(
      np.asarray(jax.tree_util.tree_leaves(state.agent_state.actor_params)[0]),
      np.asarray(jax.tree_util.tree_leaves(new_state.actor_params)[0]))


def test_ppo_loop_learns_cartpole_smoke():
  """20 iterations of PPO must beat random return on CartPole-200."""
  env = BatchedJaxEnv(CartPole(), batch_size=8)
  agent = PPOAgent(
      env.time_step_spec(), env.action_spec(), optax.adam(3e-4),
      networks.make_actor_distribution_network(
          env.time_step_spec().observation, env.action_spec(),
          fc_layer_params=(32, 32)),
      networks.make_value_network(env.time_step_spec().observation,
                                  fc_layer_params=(32, 32)),
      num_epochs=4, num_minibatches=2, entropy_regularization=0.01)
  loop = OnPolicyTrainLoop(env, agent,
                           metrics.standard_collect_metrics(20),
                           rollout_length=64)
  state = jax.jit(loop.init)(jax.random.key(0))
  run = jax.jit(lambda s: loop.run(s, 20))
  state, _ = run(state)
  state, _ = run(state)
  ret = float(loop.metrics[2].result(state.metric_states[2]))
  assert ret > 40.0, f"PPO did not improve over random (~20): {ret}"
