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


def test_ppo_kl_penalty_uses_unclipped_surrogate():
  """importance_ratio_clipping=0.0 (the KL-penalty variant) must use the
  PLAIN surrogate -ratio*adv, not -min(ratio*adv, adv) with a degenerate
  clip(ratio, 1, 1)=1 — the min() form zeroes the gradient for ~half the
  samples (reference ppo_agent.py:1398-1401 branches explicitly). The
  round-4 review caught the degenerate form."""
  agent = _ppo(importance_ratio_clipping=0.0, normalize_advantages=False,
               initial_adaptive_kl_beta=1.0, num_epochs=1)
  state, experience = _rollout(agent)
  astate = state.agent_state
  # Evaluate the loss at PERTURBED actor params so ratio != 1 and the two
  # surrogates genuinely differ; pg must equal -mean(ratio * adv).
  perturbed = jax.tree_util.tree_map(
      lambda x: x + 0.05 * jnp.ones_like(x), astate.actor_params)
  returns, advantages = agent.compute_return_and_advantage(astate,
                                                           experience)
  from agents_tpu.trajectories import time_step as ts_mod
  from agents_tpu.utils import common as common_lib
  obs = experience.observation[:, :-1]
  st = experience.step_type[:, :-1]
  actions = experience.action[:, :-1]
  old_dist = jax.tree_util.tree_map(  # slice the dist's param leaves
      lambda t: t[:, :-1], experience.policy_info["dist"])
  old_values = experience.policy_info["value_prediction"][:, :-1]
  mask = (st != ts_mod.StepType.LAST).astype(jnp.float32)
  old_log_prob = common_lib.log_probability(old_dist, actions)

  flatten = lambda x: jax.tree_util.tree_map(
      lambda t: t.reshape((-1,) + t.shape[2:]), x)
  batch = tuple(flatten(x) for x in (
      obs, st, actions, old_dist, old_values, returns.reshape(-1),
      advantages.reshape(-1), old_log_prob, mask))
  (_, (extra, _)) = agent._loss(
      (perturbed, astate.value_params), astate, batch)

  obs_n = agent.obs_normalizer.normalize(astate.obs_norm_state, batch[0])
  dist, _ = agent.actor_network.apply(perturbed, obs_n, batch[1], ())
  ratio = jnp.exp(common_lib.log_probability(dist, batch[2]) - batch[7])
  denom = jnp.maximum(jnp.sum(batch[8]), 1.0)
  expected_pg = -jnp.sum(ratio * batch[6] * batch[8]) / denom
  np.testing.assert_allclose(float(extra.policy_gradient_loss),
                             float(expected_pg), rtol=1e-5)
  # and the degenerate min() form would differ for this perturbation
  clipped_pg = -jnp.sum(jnp.minimum(ratio * batch[6], batch[6])
                        * batch[8]) / denom
  assert not np.isclose(float(expected_pg), float(clipped_pg), rtol=1e-3)


def test_index_with_actions_multi_dim():
  from agents_tpu.utils import common as common_lib
  q = jnp.arange(2 * 3 * 4, dtype=jnp.float32).reshape(2, 3, 4)
  actions = jnp.asarray([[1, 2], [0, 3]], jnp.int32)  # [B, 2]
  out = common_lib.index_with_actions(q, actions, multi_dim_actions=True)
  np.testing.assert_allclose(np.asarray(out),
                             [q[0, 1, 2], q[1, 0, 3]])
  # rank mismatch is rejected loudly
  import pytest
  with pytest.raises(ValueError):
    common_lib.index_with_actions(q[..., 0], actions,
                                  multi_dim_actions=True)


def test_streaming_normalizer_exact_parallel_variance():
  """Streaming stats must match exact whole-dataset mean/std (Chan's
  parallel combine, reference parallel_variance_calculation) — the old
  around-the-stale-mean accumulation measured the FIRST batch's
  deviations from zero, inflating early std by ~|mean|/std x."""
  from agents_tpu.utils.tensor_normalizer import StreamingTensorNormalizer

  spec = specs.ArraySpec((), np.float32)
  norm = StreamingTensorNormalizer(spec)
  state = norm.init()
  rng = np.random.RandomState(0)
  data = (10.0 + rng.randn(6, 32)).astype(np.float32)  # mean 10, std 1
  for batch in data:
    state = norm.update(state, jnp.asarray(batch))
  count = float(np.asarray(jax.tree_util.tree_leaves(state.count)[0]))
  mean = float(np.asarray(
      jax.tree_util.tree_leaves(state.mean_sum)[0])) / count
  var = float(np.asarray(
      jax.tree_util.tree_leaves(state.var_sum)[0])) / count
  np.testing.assert_allclose(mean, data.mean(), rtol=1e-5)
  np.testing.assert_allclose(var, data.var(), rtol=1e-4)


def test_ema_normalizer_survives_batch_size_one():
  """EMA variance is computed around the MOVING mean (reference
  tensor_normalizer.py:258-263): around the batch mean, a batch of one
  yields var=0 every update and the var EMA collapses to ~0."""
  from agents_tpu.utils.tensor_normalizer import EMATensorNormalizer

  spec = specs.ArraySpec((), np.float32)
  norm = EMATensorNormalizer(spec, norm_update_rate=0.05)
  state = norm.init()
  rng = np.random.RandomState(1)
  for _ in range(400):  # stream of single samples ~ N(3, 2^2)
    state = norm.update(state, jnp.asarray(
        np.float32(3.0 + 2.0 * rng.randn()))[None])
  var = float(np.asarray(jax.tree_util.tree_leaves(state.var)[0]))
  assert var > 1.0, var  # collapsed-to-zero variance fails loudly


def test_np_sample_spec_nest_covers_discrete_range():
  """Warmup random actions must reach the max discrete action (review:
  uniform-float + astype truncation never sampled it; a 2-action spec
  warmed up on all-zeros)."""
  from agents_tpu.specs import array_spec

  rng = np.random.RandomState(0)
  two = specs.BoundedArraySpec((), np.int32, 0, 1)
  acts = array_spec.np_sample_spec_nest(two, rng, outer_dims=(256,))
  assert set(np.unique(acts)) == {0, 1}
  cont = specs.BoundedArraySpec((2,), np.float32, -1.0, 1.0)
  xs = array_spec.np_sample_spec_nest(cont, rng, outer_dims=(64,))
  assert xs.shape == (64, 2) and xs.min() >= -1.0 and xs.max() <= 1.0
