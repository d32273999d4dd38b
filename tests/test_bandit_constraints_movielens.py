"""Bandit constraints (tf_agents/bandits/policies/constraints.py contracts)
and MovieLens environments."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from agents_tpu import networks, specs
from agents_tpu.bandits.agents import LinUcbAgent
from agents_tpu.bandits.agents.neural_bandit_agents import (
    GreedyRewardPredictionAgent,)
from agents_tpu.bandits.environments import (MovieLensBandit,
                                             MovieLensPerArmBandit,
                                             synthetic_ratings_matrix)
from agents_tpu.bandits.metrics import RegretMetric
from agents_tpu.bandits.policies import (AbsoluteConstraint, NeuralConstraint,
                                         compute_feasibility_probability,
                                         construct_mask_from_multiple_sources,
                                         pinball_loss)
from agents_tpu.bandits.specs import bandit_spec_utils as bsu
from agents_tpu.environments.jax_environment import BatchedJaxEnv
from agents_tpu.trajectories import time_step as ts
from agents_tpu.trajectories import trajectory as tj
from agents_tpu.train import OnPolicyTrainLoop

RATINGS = synthetic_ratings_matrix(60, 30, rank=3, seed=0)


def test_movielens_env_steps_and_reward_consistency():
  env = MovieLensBandit(data_matrix=RATINGS, rank_k=3, num_movies=20)
  key = jax.random.key(0)
  state, first = jax.jit(env.reset)(key)
  assert first.observation.shape == (3,)
  action = jnp.asarray(4, jnp.int32)
  state, last = jax.jit(env.step)(state, action, jax.random.key(1))
  # Reward equals the rank-k approximation's rating for that (user, movie).
  expected = env.expected_rewards(last.observation)[4]
  np.testing.assert_allclose(float(last.reward), float(expected), rtol=1e-5)
  assert float(env.optimal_reward_fn(last.observation)) >= float(last.reward)


def test_movielens_rank_k_approximation_matches_svd():
  env = MovieLensBandit(data_matrix=RATINGS, rank_k=30, num_movies=30)
  # Full-rank factorization must reproduce the (user-filtered) matrix:
  approx = np.asarray(env._u_hat) @ np.asarray(env._v_hat)
  kept = RATINGS[RATINGS.sum(axis=1) > 0.0]
  np.testing.assert_allclose(approx, kept, atol=1e-3)


def test_movielens_per_arm_env():
  env = MovieLensPerArmBandit(data_matrix=RATINGS, rank_k=3, num_actions=5)
  state, first = jax.jit(env.reset)(jax.random.key(0))
  assert first.observation[bsu.GLOBAL_FEATURE_KEY].shape == (3,)
  assert first.observation[bsu.PER_ARM_FEATURE_KEY].shape == (5, 3)
  state, last = jax.jit(env.step)(state, jnp.asarray(2, jnp.int32),
                                  jax.random.key(1))
  expected = env.expected_rewards(last.observation)[2]
  np.testing.assert_allclose(float(last.reward), float(expected), rtol=1e-5)


def test_linucb_learns_on_movielens():
  env = BatchedJaxEnv(MovieLensBandit(data_matrix=RATINGS, rank_k=3,
                                      num_movies=10), batch_size=16)
  jenv = env.env
  agent = LinUcbAgent(env.time_step_spec(), env.action_spec(), alpha=1.0)
  metric = RegretMetric(jenv.optimal_reward_fn)
  loop = OnPolicyTrainLoop(env, agent, (metric,), rollout_length=2)
  state = loop.init(jax.random.key(0))
  run = jax.jit(lambda s, n: loop.run(s, n), static_argnums=1)
  state, _ = run(state, 30)
  early = float(metric.result(state.metric_states[0]))
  state = state.replace(metric_states=(metric.init(env.batch_size),))
  state, _ = run(state, 30)
  late = float(metric.result(state.metric_states[0]))
  assert late < early


def test_pinball_loss_values():
  # Over-prediction penalized by (1 - q), under-prediction by q.
  np.testing.assert_allclose(
      np.asarray(pinball_loss(jnp.array([1.0]), jnp.array([3.0]), 0.25)),
      [1.5])
  np.testing.assert_allclose(
      np.asarray(pinball_loss(jnp.array([3.0]), jnp.array([1.0]), 0.25)),
      [0.5])


OBS_SPEC = specs.ArraySpec((2,), np.float32, "observation")
TSS = ts.time_step_spec(OBS_SPEC)
ACT = specs.BoundedArraySpec((), np.int32, 0, 2, "action")


def _constrained_batch(key, B=64):
  """Reward net should prefer action 0 (reward 1.0) but the constraint
  signal marks action 0 infeasible (target 0) and 1/2 feasible (1)."""
  k1, k2 = jax.random.split(key)
  obs = jax.random.normal(k1, (B, 2))
  action = jax.random.randint(k2, (B,), 0, 3)
  reward = (action == 0).astype(jnp.float32)
  feasible = (action != 0).astype(jnp.float32)
  return tj.Trajectory(
      step_type=jnp.zeros((B,), jnp.int32), observation=obs, action=action,
      policy_info=(),
      next_step_type=jnp.full((B,), 2, jnp.int32),
      reward={bsu.REWARD_SPEC_KEY: reward,
              bsu.CONSTRAINTS_SPEC_KEY: feasible[:, None]},
      discount=jnp.ones((B,)))


def test_constrained_greedy_agent_masks_infeasible_arm():
  cnet = networks.make_q_network(OBS_SPEC, ACT, fc_layer_params=(16,))
  rnet = networks.make_q_network(OBS_SPEC, ACT, fc_layer_params=(16,))
  constraint = AbsoluteConstraint(TSS, ACT, cnet,
                                  comparator_fn=jnp.greater,
                                  absolute_value=0.5)
  agent = GreedyRewardPredictionAgent(
      TSS, ACT, rnet, optax.adam(5e-2), constraints=(constraint,))
  state = agent.init(jax.random.key(0))

  train = jax.jit(agent.train)
  for i in range(150):
    batch = _constrained_batch(jax.random.key(i))
    state, loss_info = train(state, batch)
  assert float(loss_info.loss) < 0.05

  # The trained constraint marks arm 0 infeasible everywhere.
  obs = jax.random.normal(jax.random.key(999), (32, 2))
  feas = constraint(state.params["constraints"][0], obs)
  assert np.all(np.asarray(feas[:, 0]) == 0.0)
  assert np.all(np.asarray(feas[:, 1:]) == 1.0)

  # So the greedy policy never picks arm 0, despite it having the
  # highest predicted reward.
  time_step = ts.restart(obs, batch_size=32)
  step = jax.jit(agent.policy.action)(state.params, time_step,
                                      key=jax.random.key(7))
  assert np.all(np.asarray(step.action) != 0)
  # Unconstrained preds would pick arm 0:
  preds, _ = rnet.apply(state.params["reward"], obs, None, ())
  assert np.all(np.asarray(jnp.argmax(preds, -1)) == 0)

  # Deterministic (key-free distribution path) masks the same way.
  dstep = agent.policy.distribution(state.params, time_step)
  assert np.all(np.asarray(dstep.action.mode()) != 0)


def test_compute_feasibility_probability_product():
  cnet = networks.make_q_network(OBS_SPEC, ACT, fc_layer_params=(8,))
  c1 = AbsoluteConstraint(TSS, ACT, cnet, absolute_value=-1e9)  # always ok
  c2 = AbsoluteConstraint(TSS, ACT, cnet, absolute_value=1e9)   # never ok
  p1 = c1.init_params(jax.random.key(0))
  p2 = c2.init_params(jax.random.key(1))
  obs = jnp.ones((4, 2))
  prob = compute_feasibility_probability(obs, (c1, c2), (p1, p2), 3)
  np.testing.assert_allclose(np.asarray(prob), np.zeros((4, 3)))
  prob1 = compute_feasibility_probability(obs, (c1,), (p1,), 3)
  np.testing.assert_allclose(np.asarray(prob1), np.ones((4, 3)))


def test_construct_mask_from_num_actions_feature():
  obs = {"f": jnp.ones((3, 2)),
         bsu.NUM_ACTIONS_FEATURE_KEY: jnp.array([1, 3, 2])}
  _, mask = construct_mask_from_multiple_sources(
      jax.random.key(0), obs, None, (), (), 4)
  np.testing.assert_array_equal(
      np.asarray(mask),
      [[1, 0, 0, 0], [1, 1, 1, 0], [1, 1, 0, 0]])


def test_neural_constraint_base_feasibility_is_ones():
  cnet = networks.make_q_network(OBS_SPEC, ACT, fc_layer_params=(8,))
  c = NeuralConstraint(TSS, ACT, cnet)
  p = c.init_params(jax.random.key(0))
  np.testing.assert_allclose(np.asarray(c(p, jnp.ones((2, 2)))),
                             np.ones((2, 3)))
