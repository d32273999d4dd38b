"""Non-stationary bandit environments (pure JAX, length-1 episodes).

Analogues of the reference's non-stationary family:
  - NonStationaryStochasticBandit
    (tf_agents/bandits/environments/non_stationary_stochastic_environment.py:
    EnvironmentDynamics + NonStationaryStochasticEnvironment) — dynamics are
    pure functions of the environment time (round counter) instead of
    tf.Variables mutated by the step op.
  - PiecewiseBernoulliBandit
    (piecewise_bernoulli_py_environment.py:28) — arm means change at
    change-points; the reference consumes a host-side duration *generator*,
    here the schedule is precompiled to a round->piece lookup table so the
    device step stays a single gather.
  - PiecewiseStationaryStochasticBandit
    (piecewise_stochastic_environment.py:39,241) — observation distribution
    and per-arm linear reward parameters re-drawn at each change-point; the
    reference samples them lazily inside the step, here each piece's
    parameters are derived deterministically by folding the piece index into
    the seed, which is equivalent in distribution and keeps the step pure.

All rounds are tracked by `BanditState.round`, which the base class
increments every step, so "env time" is free (bandit_envs.py:31-78).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from agents_tpu.bandits.environments.bandit_envs import BanditJaxEnvironment
from agents_tpu.specs import array_spec


class NonStationaryStochasticBandit(BanditJaxEnvironment):
  """Generic time-indexed dynamics.

  The reference's `EnvironmentDynamics` carries an `env_time` variable and
  abstract `observation(env_time)` / `reward(observation, env_time)`
  methods. Here both are pure functions that additionally receive a PRNG
  key, which replaces the reference's stateful `tf.random` ops:

    observation_fn(key, round) -> observation
    reward_fn(observation, action, key, round) -> scalar reward

  Optional `optimal_reward_fn` / `optimal_action_fn` (observation-only, for
  the regret metrics) and `expected_rewards_fn(observation, round)` (for
  time-aware analysis) may be supplied.
  """

  def __init__(self,
               observation_spec,
               action_spec,
               observation_fn: Callable,
               reward_fn: Callable,
               optimal_reward_fn: Optional[Callable] = None,
               optimal_action_fn: Optional[Callable] = None,
               expected_rewards_fn: Optional[Callable] = None):
    self._observation_spec = observation_spec
    self._action_spec = action_spec
    self._observation_fn = observation_fn
    self._reward_fn = reward_fn
    self._optimal_reward_fn = optimal_reward_fn
    self._optimal_action_fn = optimal_action_fn
    self._expected_rewards_fn = expected_rewards_fn

  def observation_spec(self):
    return self._observation_spec

  def action_spec(self):
    return self._action_spec

  def _sample_context(self, key, round_):
    return self._observation_fn(key, round_)

  def _reward(self, context, action, key, round_):
    return self._reward_fn(context, action, key, round_)

  def expected_rewards_at(self, observation, round_):
    if self._expected_rewards_fn is None:
      raise NotImplementedError
    return self._expected_rewards_fn(observation, round_)

  def optimal_reward_fn(self, observation):
    if self._optimal_reward_fn is None:
      raise NotImplementedError
    return self._optimal_reward_fn(observation)

  def optimal_action_fn(self, observation):
    if self._optimal_action_fn is None:
      raise NotImplementedError
    return self._optimal_action_fn(observation)


def piece_schedule(durations: Sequence[int], num_pieces: int,
                   horizon: int) -> np.ndarray:
  """Expands change-point durations into a round->piece lookup table.

  The reference walks a Python duration generator while stepping
  (piecewise_bernoulli_py_environment.py:126-136 `_increment_time`); on
  TPU the whole schedule is precompiled: `table[t]` is the active piece at
  round t, pieces wrapping modulo `num_pieces` as in the reference. Rounds
  beyond `horizon` clamp to the final entry.
  """
  table = np.zeros((horizon,), np.int32)
  t, piece = 0, -1
  i = 0
  while t < horizon:
    d = int(durations[i % len(durations)])
    if d < 0:
      raise ValueError(f"durations must be non-negative, got {d}")
    piece = (piece + 1) % num_pieces
    table[t:t + d] = piece
    t += d
    i += 1
    if d == 0 and i > len(durations) * (horizon + 1):
      raise ValueError("duration schedule makes no progress")
  return table


class PiecewiseBernoulliBandit(BanditJaxEnvironment):
  """Piecewise-stationary Bernoulli arms.

  piece_means: [num_pieces, num_arms] floats in [0, 1]; the active piece
  follows `piece_schedule(durations, ...)` (reference
  piecewise_bernoulli_py_environment.py:67-136).
  """

  def __init__(self, piece_means, durations: Sequence[int],
               horizon: int = 100_000):
    self.piece_means = jnp.asarray(piece_means, jnp.float32)
    if self.piece_means.ndim != 2:
      raise ValueError("piece_means must be [num_pieces, num_arms]")
    if (np.any(np.asarray(piece_means) < 0.0)
        or np.any(np.asarray(piece_means) > 1.0)):
      raise ValueError("All parameters should be floats in [0, 1].")
    self.num_pieces, self.num_arms = self.piece_means.shape
    self.schedule = jnp.asarray(
        piece_schedule(durations, self.num_pieces, horizon))
    self.horizon = horizon

  def observation_spec(self):
    return array_spec.ArraySpec((1,), np.int32, "observation")

  def action_spec(self):
    return array_spec.BoundedArraySpec((), np.int32, 0, self.num_arms - 1,
                                       "action")

  def _piece(self, round_):
    idx = jnp.minimum(round_, self.horizon - 1)
    return self.schedule[idx]

  def _sample_context(self, key, round_):
    del key, round_
    return jnp.zeros((1,), jnp.int32)

  def _reward(self, context, action, key, round_):
    mean = self.piece_means[self._piece(round_), action]
    return jax.random.bernoulli(key, mean).astype(jnp.float32)

  def means_at(self, round_):
    return self.piece_means[self._piece(round_)]


class PiecewiseStationaryStochasticBandit(BanditJaxEnvironment):
  """Piecewise linear-Gaussian contextual bandit.

  Per piece p: observation ~ N(mu[p], sigma_obs[p]) elementwise, reward for
  arm k = theta[p, k]ᵀ x + N(0, sigma_rew). The reference
  (piecewise_stochastic_environment.py:39-240) redraws (mu, theta) from
  seeded distributions at every change-point; here piece parameters are
  derived up-front by folding the piece index into `seed` — same
  distribution, but the device step is stateless.
  """

  def __init__(self, context_dim: int, num_arms: int, num_pieces: int,
               durations: Sequence[int], seed: int = 0,
               observation_std: float = 1.0, reward_std: float = 0.1,
               horizon: int = 100_000):
    self.context_dim = context_dim
    self.num_arms = num_arms
    self.num_pieces = num_pieces
    key = jax.random.key(seed)
    k_mu, k_theta = jax.random.split(key)
    self.mu = jax.random.normal(k_mu, (num_pieces, context_dim), jnp.float32)
    self.theta = jax.random.normal(
        k_theta, (num_pieces, num_arms, context_dim), jnp.float32)
    self.observation_std = observation_std
    self.reward_std = reward_std
    self.schedule = jnp.asarray(piece_schedule(durations, num_pieces, horizon))
    self.horizon = horizon

  def observation_spec(self):
    return array_spec.ArraySpec((self.context_dim,), np.float32,
                                "observation")

  def action_spec(self):
    return array_spec.BoundedArraySpec((), np.int32, 0, self.num_arms - 1,
                                       "action")

  def _piece(self, round_):
    idx = jnp.minimum(round_, self.horizon - 1)
    return self.schedule[idx]

  def _sample_context(self, key, round_):
    p = self._piece(round_)
    return self.mu[p] + self.observation_std * jax.random.normal(
        key, (self.context_dim,), jnp.float32)

  def _reward(self, context, action, key, round_):
    p = self._piece(round_)
    mean = self.theta[p, action] @ context
    return mean + self.reward_std * jax.random.normal(key)

  def expected_rewards_at(self, observation, round_):
    p = self._piece(round_)
    return jnp.einsum("...d,kd->...k", observation, self.theta[p])
