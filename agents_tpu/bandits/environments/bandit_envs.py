"""Pure-JAX bandit environments (length-1 episodes).

Analogues of ``tf_agents/bandits/environments/``:
  - BanditJaxEnvironment base (bandit_py_environment.py /
    bandit_tf_environment.py: observe -> action -> reward, episode len 1)
  - StationaryStochasticBandit (stationary_stochastic_py_environment.py:29)
  - BernoulliBandit (bernoulli_py_environment.py)
  - DriftingLinearBandit (drifting_linear_environment.py)
  - WheelBandit (wheel_py_environment.py)
  - ClassificationBandit (classification_environment.py:62)
  - RandomBandit (random_bandit_environment.py)

Each env exposes `optimal_reward_fn(observation)` for the regret metrics
(the reference passes these functions to RegretMetric).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from agents_tpu.environments.jax_environment import JaxEnvironment
from agents_tpu.specs import array_spec
from agents_tpu.trajectories import time_step as ts


@struct.dataclass
class BanditState:
  context: Any
  key: jax.Array
  round: jax.Array  # int32 global round counter (for drifting envs)


class BanditJaxEnvironment(JaxEnvironment):
  """One-round episodes: reset -> FIRST(context); step -> LAST(reward)."""

  def observation_spec(self):
    raise NotImplementedError

  def action_spec(self):
    raise NotImplementedError

  def _sample_context(self, key, round_):
    raise NotImplementedError

  def _reward(self, context, action, key, round_):
    raise NotImplementedError

  def optimal_reward_fn(self, observation):
    """Expected reward of the best arm given the observation."""
    raise NotImplementedError

  def optimal_action_fn(self, observation):
    raise NotImplementedError

  def reset(self, key):
    k_ctx, k_next = jax.random.split(key)
    context = self._sample_context(k_ctx, jnp.zeros((), jnp.int32))
    state = BanditState(context=context, key=k_next,
                        round=jnp.zeros((), jnp.int32))
    return state, ts.restart(context, reward_spec=self.reward_spec())

  def auto_reset(self, state, key):
    """Between-episode reset that PRESERVES env time (BatchedJaxEnv
    auto-reset hook): bandit episodes are length 1 and `step` already
    staged the next round's context and round counter in `state`;
    rewinding to reset(key) (round=0) would freeze every non-stationary
    env (drifting/piecewise schedules) at t=0 forever."""
    del key
    return state, ts.restart(state.context, reward_spec=self.reward_spec())

  def step(self, state: BanditState, action, key):
    k_rew, k_ctx = jax.random.split(key)
    reward = self._reward(state.context, action, k_rew, state.round)
    new_context = self._sample_context(k_ctx, state.round + 1)
    new_state = BanditState(context=new_context, key=key,
                            round=state.round + 1)
    # LAST with the SAME observation (context of the round just played) —
    # the next FIRST (auto-reset) carries the new context. Reward may be a
    # structure (e.g. ranking CASCADING feedback or constraint dicts).
    reward = jax.tree_util.tree_map(
        lambda r: jnp.asarray(r, jnp.float32), reward)
    return new_state, ts.TimeStep(
        step_type=jnp.asarray(ts.StepType.LAST, jnp.int32),
        reward=reward,
        discount=jnp.zeros((), jnp.float32),
        observation=state.context)


class StationaryStochasticBandit(BanditJaxEnvironment):
  """Linear payoffs r = thetaᵀx + N(0, sigma) (reference
  stationary_stochastic_py_environment.py:29 with LinearNormalReward
  functions from environment_utilities.py)."""

  def __init__(self, arm_parameters, context_dim: Optional[int] = None,
               noise_std: float = 0.1, context_low=-1.0, context_high=1.0):
    self.theta = jnp.asarray(arm_parameters, jnp.float32)  # [K, d]
    self.num_arms, self.context_dim = self.theta.shape
    self.noise_std = noise_std
    self.context_low = context_low
    self.context_high = context_high

  def observation_spec(self):
    return array_spec.BoundedArraySpec(
        (self.context_dim,), np.float32, self.context_low,
        self.context_high, "observation")

  def action_spec(self):
    return array_spec.BoundedArraySpec((), np.int32, 0, self.num_arms - 1,
                                       "action")

  def _sample_context(self, key, round_):
    return jax.random.uniform(key, (self.context_dim,), jnp.float32,
                              self.context_low, self.context_high)

  def _reward(self, context, action, key, round_):
    mean = self.theta[action] @ context
    return mean + self.noise_std * jax.random.normal(key)

  def expected_rewards(self, observation):
    return jnp.einsum("...d,kd->...k", observation, self.theta)

  def optimal_reward_fn(self, observation):
    return jnp.max(self.expected_rewards(observation), axis=-1)

  def optimal_action_fn(self, observation):
    return jnp.argmax(self.expected_rewards(observation), axis=-1)


class DriftingLinearBandit(StationaryStochasticBandit):
  """Arm parameters rotate slowly over rounds (reference
  drifting_linear_environment.py); drift_rate radians/round in the plane
  of the first two context dims."""

  def __init__(self, arm_parameters, drift_rate: float = 0.01, **kwargs):
    super().__init__(arm_parameters, **kwargs)
    self.drift_rate = drift_rate

  def _theta_at(self, round_):
    angle = self.drift_rate * round_.astype(jnp.float32)
    c, s = jnp.cos(angle), jnp.sin(angle)
    rot = jnp.eye(self.context_dim)
    rot = rot.at[0, 0].set(c).at[0, 1].set(-s).at[1, 0].set(s).at[1, 1].set(c)
    return self.theta @ rot

  def _reward(self, context, action, key, round_):
    mean = self._theta_at(round_)[action] @ context
    return mean + self.noise_std * jax.random.normal(key)


class BernoulliBandit(BanditJaxEnvironment):
  """Context-free Bernoulli arms (reference bernoulli_py_environment.py)."""

  def __init__(self, means):
    self.means = jnp.asarray(means, jnp.float32)
    self.num_arms = self.means.shape[0]

  def observation_spec(self):
    return array_spec.BoundedArraySpec((1,), np.float32, 0.0, 1.0,
                                       "observation")

  def action_spec(self):
    return array_spec.BoundedArraySpec((), np.int32, 0, self.num_arms - 1,
                                       "action")

  def _sample_context(self, key, round_):
    del key, round_
    return jnp.ones((1,), jnp.float32)

  def _reward(self, context, action, key, round_):
    return jax.random.bernoulli(key, self.means[action]).astype(jnp.float32)

  def optimal_reward_fn(self, observation):
    shape = jnp.shape(observation)[:-1]
    return jnp.broadcast_to(jnp.max(self.means), shape)

  def optimal_action_fn(self, observation):
    shape = jnp.shape(observation)[:-1]
    return jnp.broadcast_to(jnp.argmax(self.means), shape)


class WheelBandit(BanditJaxEnvironment):
  """Riquelme et al. wheel bandit (reference wheel_py_environment.py):
  contexts uniform in the unit disk; arm 0 safe; arms 1-4 pay high mean
  only in their quadrant when ||x|| > delta."""

  def __init__(self, delta: float = 0.5, mu_inside: float = 1.0,
               mu_high: float = 50.0, mu_low: float = 1.0,
               noise_std: float = 0.01):
    self.delta = delta
    self.mu_inside = mu_inside
    self.mu_high = mu_high
    self.mu_low = mu_low
    self.noise_std = noise_std

  def observation_spec(self):
    return array_spec.BoundedArraySpec((2,), np.float32, -1.0, 1.0,
                                       "observation")

  def action_spec(self):
    return array_spec.BoundedArraySpec((), np.int32, 0, 4, "action")

  def _sample_context(self, key, round_):
    def body(carry):
      k, _ = carry
      k, sub = jax.random.split(k)
      x = jax.random.uniform(sub, (2,), jnp.float32, -1.0, 1.0)
      return k, x

    def cond(carry):
      _, x = carry
      return jnp.sum(x**2) > 1.0

    k, x0 = body((key, jnp.ones(2)))
    _, x = jax.lax.while_loop(cond, lambda c: body(c), (k, x0))
    return x

  def _mean_rewards(self, context):
    norm = jnp.sqrt(jnp.sum(context**2, axis=-1))
    outside = norm > self.delta
    quadrant = (jnp.asarray(context[..., 0] >= 0, jnp.int32)
                + 2 * jnp.asarray(context[..., 1] >= 0, jnp.int32))
    # map quadrant (x>=0,y>=0)->arm ordering 1..4
    arm_for_quadrant = jnp.array([3, 2, 4, 1])  # (-,-),(+,-),(-,+),(+,+)
    hot_arm = arm_for_quadrant[quadrant]
    means = jnp.full(jnp.shape(norm) + (5,), self.mu_low)
    means = means.at[..., 0].set(self.mu_inside)
    hot = jax.nn.one_hot(hot_arm, 5) * outside[..., None]
    return jnp.where(hot > 0, self.mu_high, means)

  def _reward(self, context, action, key, round_):
    mean = self._mean_rewards(context)[action]
    return mean + self.noise_std * jax.random.normal(key)

  def optimal_reward_fn(self, observation):
    return jnp.max(self._mean_rewards(observation), axis=-1)

  def optimal_action_fn(self, observation):
    return jnp.argmax(self._mean_rewards(observation), axis=-1)


class ClassificationBandit(BanditJaxEnvironment):
  """Supervised dataset -> bandit (reference
  classification_environment.py:62): context = features, reward = reward
  table[label, action]."""

  def __init__(self, features, labels, reward_table, reward_sampler=None):
    """reward_table: [num_classes, num_actions] expected rewards (drives
    the deterministic reward and the regret baseline). reward_sampler:
    optional `(label, action, key) -> reward` for stochastic rewards
    (e.g. `dataset_utilities.mushroom_reward_sampler`); when given, it
    replaces the table lookup for the realized reward and the table is
    its expectation."""
    self.features = jnp.asarray(features, jnp.float32)  # [N, d]
    self.labels = jnp.asarray(labels, jnp.int32)        # [N]
    self.reward_table = jnp.asarray(reward_table, jnp.float32)  # [C, K]
    self.reward_sampler = reward_sampler
    self.n = self.features.shape[0]

  def observation_spec(self):
    return array_spec.ArraySpec((self.features.shape[1],), np.float32,
                                "observation")

  def action_spec(self):
    return array_spec.BoundedArraySpec(
        (), np.int32, 0, self.reward_table.shape[1] - 1, "action")

  def _sample_context(self, key, round_):
    idx = jax.random.randint(key, (), 0, self.n)
    # stash the index in the last "context" slot? Keep exact: recompute
    # label lookup by nearest feature match is wasteful; instead carry the
    # label via closure-free trick: context stores features; reward looks
    # up by re-sampling with the same key is impossible. So we append the
    # label as an extra hidden dim, stripped in observation? Simpler:
    # store index-tagged context.
    return jnp.concatenate(
        [self.features[idx], jnp.asarray([idx], jnp.float32)])

  def reset(self, key):
    state, time_step = super().reset(key)
    return state, time_step.replace(observation=time_step.observation[:-1])

  def auto_reset(self, state, key):
    state, time_step = super().auto_reset(state, key)
    return state, time_step.replace(observation=time_step.observation[:-1])

  def step(self, state, action, key):
    new_state, time_step = super().step(state, action, key)
    return new_state, time_step.replace(
        observation=time_step.observation[:-1])

  def _reward(self, context, action, key, round_):
    idx = context[-1].astype(jnp.int32)
    label = self.labels[idx]
    if self.reward_sampler is not None:
      return self.reward_sampler(label, action, key)
    return self.reward_table[label, action]

  def optimal_reward_fn(self, observation):
    # Best possible reward given unknown label is not observable; the
    # reference computes expected-optimal from the dataset. Here: max over
    # actions of the average reward table row weighted by... we return the
    # per-round max via label lookup during metrics using tagged contexts
    # is unavailable — return the table max (upper bound).
    shape = jnp.shape(observation)[:-1]
    return jnp.broadcast_to(jnp.max(self.reward_table), shape)


class RandomBandit(BanditJaxEnvironment):
  """Gaussian contexts and rewards (reference
  random_bandit_environment.py)."""

  def __init__(self, context_dim: int = 4, num_arms: int = 3):
    self.context_dim = context_dim
    self.num_arms = num_arms

  def observation_spec(self):
    return array_spec.ArraySpec((self.context_dim,), np.float32,
                                "observation")

  def action_spec(self):
    return array_spec.BoundedArraySpec((), np.int32, 0, self.num_arms - 1,
                                       "action")

  def _sample_context(self, key, round_):
    return jax.random.normal(key, (self.context_dim,), jnp.float32)

  def _reward(self, context, action, key, round_):
    return jax.random.normal(key)

  def optimal_reward_fn(self, observation):
    return jnp.zeros(jnp.shape(observation)[:-1])
