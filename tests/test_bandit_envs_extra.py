"""Non-stationary, piecewise, per-arm, action-mask, and ranking bandit
environments + dataset/environment utilities + DistanceFromGreedy metric.

Mirrors the reference's env tests (piecewise_bernoulli_py_environment_test,
ranking_environment usage in ranking examples, dataset_utilities_test)."""
import jax
import jax.numpy as jnp
import numpy as np

from agents_tpu.bandits.environments import (
    BernoulliActionMaskBandit, BernoulliBandit, ClassificationBandit,
    ClickModel, FeedbackModel, NonStationaryStochasticBandit,
    PiecewiseBernoulliBandit, PiecewiseStationaryStochasticBandit,
    RankingBanditEnv, StationaryStochasticPerArmBandit,
    cascading_to_score_vector, dataset_utilities, environment_utilities,
    piece_schedule)
from agents_tpu.bandits.metrics import DistanceFromGreedyMetric
from agents_tpu.bandits.specs.bandit_spec_utils import (
    GLOBAL_FEATURE_KEY, NUM_ACTIONS_FEATURE_KEY, PER_ARM_FEATURE_KEY)
from agents_tpu.environments.jax_environment import BatchedJaxEnv
from agents_tpu.specs import array_spec
from agents_tpu.trajectories import time_step as ts


def _roll(env1, steps, batch_size=4, seed=0):
  """Steps a single-instance bandit env through `steps` rounds (batched,
  auto-reset) and returns the sequence of (time_step, action) pairs."""
  env = BatchedJaxEnv(env1, batch_size=batch_size)
  key = jax.random.key(seed)
  state, step = env.reset(key)
  out = [step]
  aspec = env.action_spec()
  for i in range(steps):
    key, k_act, k_step = jax.random.split(key, 3)
    if aspec.shape == ():
      action = jax.random.randint(k_act, (batch_size,), aspec.minimum,
                                  aspec.maximum + 1).astype(aspec.dtype)
    else:
      action = jax.random.randint(
          k_act, (batch_size,) + tuple(aspec.shape), aspec.minimum,
          aspec.maximum + 1).astype(aspec.dtype)
    state, step = env.step(state, out[-1], action, k_step)
    out.append(step)
  return out


def test_piece_schedule_wraps_and_clamps():
  table = piece_schedule([2, 3], num_pieces=2, horizon=12)
  #  t: 0 1 | 2 3 4 | 5 6 | 7 8 9 | 10 11
  np.testing.assert_array_equal(
      table, [0, 0, 1, 1, 1, 0, 0, 1, 1, 1, 0, 0])


def test_piecewise_bernoulli_means_switch():
  env = PiecewiseBernoulliBandit([[0.0, 1.0], [1.0, 0.0]],
                                 durations=[3], horizon=64)
  np.testing.assert_allclose(env.means_at(jnp.asarray(0)), [0.0, 1.0])
  np.testing.assert_allclose(env.means_at(jnp.asarray(3)), [1.0, 0.0])
  np.testing.assert_allclose(env.means_at(jnp.asarray(6)), [0.0, 1.0])
  # With 0/1 means the reward is deterministic: arm 1 pays exactly the
  # active piece's mean.
  r = env._reward(jnp.zeros((1,), jnp.int32), jnp.asarray(1),
                  jax.random.key(0), jnp.asarray(0))
  assert float(r) == 1.0
  r = env._reward(jnp.zeros((1,), jnp.int32), jnp.asarray(1),
                  jax.random.key(0), jnp.asarray(4))
  assert float(r) == 0.0


def test_piecewise_stochastic_reward_changes_by_piece():
  env = PiecewiseStationaryStochasticBandit(
      context_dim=3, num_arms=2, num_pieces=2, durations=[5],
      reward_std=0.0, horizon=32)
  x = jnp.ones((3,))
  e0 = env.expected_rewards_at(x, jnp.asarray(0))
  e1 = env.expected_rewards_at(x, jnp.asarray(5))
  assert e0.shape == (2,)
  assert not np.allclose(np.asarray(e0), np.asarray(e1))
  steps = _roll(env, 3)
  assert steps[-1].observation.shape == (4, 3)


def test_non_stationary_env_round_threading():
  """Reward = env round: proves the round counter reaches reward_fn."""
  env = NonStationaryStochasticBandit(
      observation_spec=array_spec.ArraySpec((2,), np.float32),
      action_spec=array_spec.BoundedArraySpec((), np.int32, 0, 1),
      observation_fn=lambda key, t: jnp.zeros((2,), jnp.float32),
      reward_fn=lambda obs, a, key, t: t.astype(jnp.float32))
  steps = _roll(env, 4, batch_size=2)
  # Bandit episodes are length 1: LAST frames at steps 1,3 carry rewards
  # of rounds 0,1,... (every other step is an auto-reset FIRST).
  rewards = [float(s.reward[0]) for s in steps if int(s.step_type[0]) == 2]
  assert rewards == sorted(rewards)
  assert rewards[0] == 0.0


def test_per_arm_env_reward_uses_chosen_arm():
  env = StationaryStochasticPerArmBandit(
      global_sampling_fn=lambda k: jnp.ones((2,), jnp.float32),
      arm_sampling_fn=lambda k: jax.random.normal(k, (3,)),
      reward_fn=lambda x, k: jnp.sum(x),
      expected_reward_fn=lambda x: jnp.sum(x, axis=-1),
      global_dim=2, arm_dim=3, max_num_actions=4)
  state, first = BatchedJaxEnv(env, 2).reset(jax.random.key(0))
  obs = first.observation
  assert obs[GLOBAL_FEATURE_KEY].shape == (2, 2)
  assert obs[PER_ARM_FEATURE_KEY].shape == (2, 4, 3)
  ctx = jax.tree_util.tree_map(lambda x: x[0], obs)
  r = env._reward(ctx, jnp.asarray(2), jax.random.key(1), jnp.asarray(0))
  expect = jnp.sum(ctx[GLOBAL_FEATURE_KEY]) + jnp.sum(
      ctx[PER_ARM_FEATURE_KEY][2])
  np.testing.assert_allclose(float(r), float(expect), rtol=1e-5)
  # optimal = best arm's expectation
  opt = env.optimal_reward_fn(ctx)
  all_r = [float(jnp.sum(ctx[GLOBAL_FEATURE_KEY])
                 + jnp.sum(ctx[PER_ARM_FEATURE_KEY][a])) for a in range(4)]
  np.testing.assert_allclose(float(opt), max(all_r), rtol=1e-5)


def test_per_arm_env_variable_num_actions():
  env = StationaryStochasticPerArmBandit(
      global_sampling_fn=lambda k: jnp.zeros((2,), jnp.float32),
      arm_sampling_fn=lambda k: jnp.ones((1,), jnp.float32),
      reward_fn=lambda x, k: jnp.sum(x),
      expected_reward_fn=lambda x: -jnp.sum(x, axis=-1),
      global_dim=2, arm_dim=1, max_num_actions=5,
      num_actions_fn=lambda k: jax.random.randint(k, (), 1, 6))
  ctx = env._sample_context(jax.random.key(3), jnp.asarray(0))
  n = int(ctx[NUM_ACTIONS_FEATURE_KEY])
  assert 1 <= n <= 5
  # masked arms can never be the optimum
  a = int(env.optimal_action_fn(ctx))
  assert a < n


def test_action_mask_env_mask_never_all_zero():
  inner = BernoulliBandit([0.1, 0.9, 0.5])
  env = BernoulliActionMaskBandit(inner, action_probability=0.05)
  ctx_spec = env.observation_spec()
  assert isinstance(ctx_spec, tuple) and ctx_spec[1].shape == (3,)
  for i in range(20):
    ctx = env._sample_context(jax.random.key(i), jnp.asarray(0))
    assert int(jnp.sum(ctx[1])) >= 1
  # reward delegates to the wrapped env
  r = env._reward(ctx, jnp.asarray(1), jax.random.key(0), jnp.asarray(0))
  assert float(r) in (0.0, 1.0)
  np.testing.assert_allclose(float(env.optimal_reward_fn(ctx)), 0.9)


def test_ranking_env_score_vector_feedback():
  env = RankingBanditEnv(
      global_sampling_fn=lambda k: jax.random.normal(k, (2,)),
      item_sampling_fn=lambda k: jax.random.normal(k, (3,)),
      num_items=6, num_slots=3,
      scores_weight_matrix=np.ones((3, 2), np.float32) * 5.0,
      global_dim=2, item_dim=3,
      feedback_model=FeedbackModel.SCORE_VECTOR,
      click_model=ClickModel.GHOST_ACTIONS)
  steps = _roll(env, 4, batch_size=3)
  last = [s for s in steps if int(s.step_type[0]) == 2][0]
  assert last.reward.shape == (3, 3)
  # one-hot-or-zero per row
  sums = np.asarray(jnp.sum(last.reward, axis=-1))
  assert np.all((sums == 0.0) | (sums == 1.0))


def test_ranking_env_cascading_and_conversion():
  env = RankingBanditEnv(
      global_sampling_fn=lambda k: jnp.ones((2,)),
      item_sampling_fn=lambda k: jnp.ones((2,)),
      num_items=5, num_slots=2,
      scores_weight_matrix=np.eye(2, dtype=np.float32) * 100.0,
      global_dim=2, item_dim=2,
      feedback_model=FeedbackModel.CASCADING,
      click_model=ClickModel.DISTANCE_BASED, distance_threshold=1.0)
  ctx = env._sample_context(jax.random.key(0), jnp.asarray(0))
  r = env._reward(ctx, jnp.asarray([0, 1]), jax.random.key(1),
                  jnp.asarray(0))
  assert set(r.keys()) == {"chosen_index", "chosen_value"}
  # scores are huge -> slot 0 clicked
  assert float(r["chosen_value"]) == 1.0
  vec = cascading_to_score_vector(r["chosen_index"], r["chosen_value"], 2)
  np.testing.assert_allclose(np.asarray(vec), [1.0, 0.0])


def test_ranking_env_distance_threshold_no_click():
  env = RankingBanditEnv(
      global_sampling_fn=lambda k: jnp.ones((2,)) * 1e-3,
      item_sampling_fn=lambda k: jnp.ones((2,)) * 1e-3,
      num_items=4, num_slots=2,
      scores_weight_matrix=np.eye(2, dtype=np.float32),
      global_dim=2, item_dim=2,
      feedback_model=FeedbackModel.CASCADING,
      click_model=ClickModel.DISTANCE_BASED, distance_threshold=10.0)
  ctx = env._sample_context(jax.random.key(0), jnp.asarray(0))
  r = env._reward(ctx, jnp.asarray([0, 1]), jax.random.key(1),
                  jnp.asarray(0))
  assert float(r["chosen_value"]) == 0.0


def test_environment_utilities_linear_rewards():
  fns = environment_utilities.sliding_linear_reward_fn_generator(3, 2, 0.0)
  x = jnp.asarray([1.0, 1.0, 1.0])
  np.testing.assert_allclose(float(fns[0](x)), 0 + 1 + 2)
  np.testing.assert_allclose(float(fns[1](x)), 1 + 2 + 3)
  np.testing.assert_allclose(
      float(environment_utilities.compute_optimal_reward(x, fns)), 6.0)
  assert int(environment_utilities.compute_optimal_action(x, fns)) == 1
  # noise only when a key is passed
  noisy = environment_utilities.LinearNormalReward([1.0, 0.0], sigma=1.0)
  assert float(noisy(jnp.asarray([2.0, 3.0]))) == 2.0
  assert float(noisy(jnp.asarray([2.0, 3.0]),
                     jax.random.key(0))) != 2.0


def test_laplacian_over_ordinal_actions():
  spec = array_spec.BoundedArraySpec((), np.int32, 0, 3)
  lap = environment_utilities.build_laplacian_over_ordinal_integer_actions(
      spec)
  expect = np.asarray([[1, -1, 0, 0], [-1, 2, -1, 0],
                       [0, -1, 2, -1], [0, 0, -1, 1]], np.float32)
  np.testing.assert_array_equal(np.asarray(lap), expect)
  # Laplacian rows sum to zero
  np.testing.assert_allclose(np.asarray(lap).sum(axis=1), 0.0)


def test_mushroom_reward_sampler_and_classification_env():
  sampler, expected = dataset_utilities.mushroom_reward_sampler(
      r_noeat=0.0, r_eat_safe=5.0, r_eat_poison_bad=-35.0,
      r_eat_poison_good=5.0, prob_poison_bad=0.5)
  np.testing.assert_allclose(expected,
                             [[0.0, 5.0], [0.0, -15.0]])
  # edible + eat always 5
  r = sampler(jnp.asarray(0), jnp.asarray(1), jax.random.key(0))
  assert float(r) == 5.0
  # poisonous + eat is one of the two outcomes
  rs = {float(sampler(jnp.asarray(1), jnp.asarray(1), jax.random.key(i)))
        for i in range(20)}
  assert rs <= {-35.0, 5.0} and len(rs) == 2
  # plug into ClassificationBandit
  feats = np.eye(4, dtype=np.float32)
  labels = np.asarray([0, 1, 0, 1])
  env = ClassificationBandit(feats, labels, expected,
                             reward_sampler=sampler)
  steps = _roll(env, 3, batch_size=2, seed=1)
  assert steps[-1].observation.shape == (2, 4)


def test_one_hot_table():
  data = np.asarray([["a", "x"], ["b", "x"], ["a", "y"]])
  table = dataset_utilities.one_hot_table(data)
  assert table.shape == (3, 4)
  np.testing.assert_allclose(table.sum(axis=1), 2.0)


def test_classification_reward_table():
  t = dataset_utilities.classification_reward_table(3, 3, 2.0, -1.0)
  np.testing.assert_array_equal(np.diag(t), [2.0, 2.0, 2.0])
  assert t[0, 1] == -1.0


def test_distance_from_greedy_metric():
  est = jnp.asarray([[1.0, 3.0], [2.0, 0.0]])
  metric = DistanceFromGreedyMetric(lambda obs: est)
  state = metric.init(batch_size=2)
  traj_like = type("T", (), {})()
  from agents_tpu.trajectories import trajectory as tj
  traj = tj.Trajectory(
      step_type=jnp.zeros((2,), jnp.int32),
      observation=jnp.zeros((2, 1)),
      action=jnp.asarray([0, 0], jnp.int32), policy_info=(),
      next_step_type=jnp.full((2,), 2, jnp.int32),
      reward=jnp.zeros((2,)), discount=jnp.zeros((2,)))
  state = metric.update(state, traj)
  # gaps: (3-1)=2 for row 0 (took 0, best 1), (2-2)=0 for row 1
  np.testing.assert_allclose(float(metric.result(state)), 1.0)


def test_explicit_positional_bias_ranking_env():
  from agents_tpu.bandits.environments import (
      ExplicitPositionalBiasRankingEnv)
  env = ExplicitPositionalBiasRankingEnv(
      global_sampling_fn=lambda k: jnp.ones((2,)),
      item_sampling_fn=lambda k: jnp.ones((2,)),
      relevance_fn=lambda g, item: jnp.sum(g * item) / 4.0,  # = 0.5
      num_items=5, observation_probs=[1.0, 0.0],
      global_dim=2, item_dim=2)
  assert env.action_spec().shape == (2,)
  ctx = env._sample_context(jax.random.key(0), jnp.asarray(0))
  # Slot 1 has observation prob 0 -> never clicked; slot 0 is clicked
  # about half the time (relevance 0.5).
  clicks = np.stack([
      np.asarray(env._reward(ctx, jnp.asarray([0, 1]), jax.random.key(i),
                             jnp.asarray(0))) for i in range(40)])
  assert clicks.shape == (40, 2)
  assert clicks[:, 1].sum() == 0.0
  assert 5 < clicks[:, 0].sum() < 35
  # rollout under jit with vector reward
  steps = _roll(env, 4, batch_size=3)
  last = [s for s in steps if int(s.step_type[0]) == 2][0]
  assert last.reward.shape == (3, 2)


def test_positional_bias_probs_validated():
  from agents_tpu.bandits.environments import (
      ExplicitPositionalBiasRankingEnv)
  import pytest
  with pytest.raises(ValueError):
    ExplicitPositionalBiasRankingEnv(
        global_sampling_fn=lambda k: jnp.ones((2,)),
        item_sampling_fn=lambda k: jnp.ones((2,)),
        relevance_fn=lambda g, i: 0.5, num_items=3,
        observation_probs=[1.5], global_dim=2, item_dim=2)


def test_nonstationary_round_advances_across_auto_reset():
  """Bandit episodes are length 1, so BatchedJaxEnv auto-resets every
  step; env time (state.round) must keep advancing or every drifting/
  piecewise schedule silently freezes at t=0 (round-4 review finding)."""
  import jax
  import jax.numpy as jnp

  from agents_tpu.bandits.environments.bandit_envs import (
      StationaryStochasticBandit,)
  from agents_tpu.environments.jax_environment import BatchedJaxEnv

  env = BatchedJaxEnv(
      StationaryStochasticBandit(
          arm_parameters=np.eye(2, dtype=np.float32), noise_std=0.0),
      batch_size=3)
  key = jax.random.key(0)
  state, tstep = env.reset(key)
  step = jax.jit(env.step)
  for i in range(5):
    key, sub = jax.random.split(key)
    state, tstep = step(state, tstep,
                        jnp.zeros((3,), jnp.int32), sub)
  # 5 batched steps alternate LAST/auto-reset-FIRST; round never rewinds
  # to 0 and strictly advances with each completed bandit round.
  rounds = np.asarray(state.round)
  assert rounds.min() >= 2, rounds
