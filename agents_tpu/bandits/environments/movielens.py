"""MovieLens bandit environments via SVD matrix factorization.

Analogues of ``tf_agents/bandits/environments/movielens_py_environment.py``
(MovieLensPyEnvironment :31) and ``movielens_per_arm_py_environment.py``:
the ratings matrix is factorized once on the host (numpy SVD); contexts
and rewards are then pure device functions of the factor matrices, so the
env steps under jit/vmap like every other BanditJaxEnvironment.

The ratings matrix can be supplied directly (e.g. synthetic, or from a
pre-parsed dataset) or loaded from the MovieLens-100K csv via
``load_movielens_data`` (reference dataset_utilities.py:157).
"""
from __future__ import annotations

import csv
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from agents_tpu.bandits.environments.bandit_envs import BanditJaxEnvironment
from agents_tpu.bandits.specs.bandit_spec_utils import (GLOBAL_FEATURE_KEY,
                                                        PER_ARM_FEATURE_KEY)
from agents_tpu.specs import array_spec

MOVIELENS_NUM_USERS = 943
MOVIELENS_NUM_MOVIES = 1682


def load_movielens_data(data_file: str, delimiter: str = ",") -> np.ndarray:
  """Parses the MovieLens-100K ratings csv (rows: user|item|rating|ts)
  into a dense [num_users, num_movies] matrix (reference
  dataset_utilities.load_movielens_data:157)."""
  ratings = np.zeros([MOVIELENS_NUM_USERS, MOVIELENS_NUM_MOVIES])
  with open(data_file, "r") as infile:
    for row in csv.reader(infile, delimiter=delimiter):
      user_id, item_id, rating, _ = row
      ratings[int(user_id) - 1, int(item_id) - 1] = float(rating)
  return ratings


def synthetic_ratings_matrix(num_users: int, num_movies: int, rank: int,
                             seed: int = 0, sparsity: float = 0.5
                             ) -> np.ndarray:
  """Low-rank synthetic stand-in for the MovieLens matrix (the real
  dataset is not bundled); ratings in [0, 5] with zeroed-out entries."""
  rng = np.random.RandomState(seed)
  u = rng.uniform(0.0, 1.0, size=(num_users, rank))
  v = rng.uniform(0.0, 1.0, size=(rank, num_movies))
  ratings = 5.0 * (u @ v) / rank
  mask = rng.uniform(size=ratings.shape) < sparsity
  return np.where(mask, ratings, 0.0)


class MovieLensBandit(BanditJaxEnvironment):
  """Global-context MovieLens bandit (reference
  movielens_py_environment.py:31): observation = the user's rank-k
  factor vector; reward for recommending movie j = the rank-k
  approximation of the user's rating of j. Deterministic given the
  sampled user (as in the reference)."""

  def __init__(self, data_matrix: Optional[np.ndarray] = None,
               data_path: Optional[str] = None, rank_k: int = 2,
               num_movies: int = 20, csv_delimiter: str = ","):
    if data_matrix is None:
      if data_path is None:
        raise ValueError("Provide data_matrix or data_path")
      data_matrix = load_movielens_data(data_path, csv_delimiter)
    data_matrix = np.asarray(data_matrix, np.float64)[:, :num_movies]
    # Drop users with no rating among the kept movies (reference :78).
    data_matrix = data_matrix[np.sum(data_matrix, axis=1) > 0.0]
    self.num_users = data_matrix.shape[0]
    self.num_actions = num_movies
    self.context_dim = rank_k

    u, s, vh = np.linalg.svd(data_matrix, full_matrices=False)
    # A ~= (u sqrt(s)) (sqrt(s) vh): observation carries u_hat, reward is
    # a dot product with v_hat — no user index needed on-device.
    self._u_hat = jnp.asarray(u[:, :rank_k] * np.sqrt(s[:rank_k]),
                              jnp.float32)                  # [Nu, k]
    self._v_hat = jnp.asarray(np.sqrt(s[:rank_k])[:, None] * vh[:rank_k],
                              jnp.float32)                  # [k, M]

  def observation_spec(self):
    return array_spec.ArraySpec((self.context_dim,), np.float32,
                                "observation")

  def action_spec(self):
    return array_spec.BoundedArraySpec((), np.int32, 0,
                                       self.num_actions - 1, "action")

  def _sample_context(self, key, round_):
    user = jax.random.randint(key, (), 0, self.num_users)
    return self._u_hat[user]

  def _reward(self, context, action, key, round_):
    del key, round_
    return context @ self._v_hat[:, action]

  def expected_rewards(self, observation):
    return jnp.einsum("...k,km->...m", observation, self._v_hat)

  def optimal_reward_fn(self, observation):
    return jnp.max(self.expected_rewards(observation), axis=-1)

  def optimal_action_fn(self, observation):
    return jnp.argmax(self.expected_rewards(observation), axis=-1)


class MovieLensPerArmBandit(BanditJaxEnvironment):
  """Per-arm MovieLens bandit (reference
  movielens_per_arm_py_environment.py): observation = {global: user
  factors [k], per_arm: movie factors [num_actions, k]} over a fresh
  without-replacement movie sample each round; reward = u s vᵀ."""

  def __init__(self, data_matrix: Optional[np.ndarray] = None,
               data_path: Optional[str] = None, rank_k: int = 2,
               num_actions: int = 10, csv_delimiter: str = ","):
    if data_matrix is None:
      if data_path is None:
        raise ValueError("Provide data_matrix or data_path")
      data_matrix = load_movielens_data(data_path, csv_delimiter)
    data_matrix = np.asarray(data_matrix, np.float64)
    self.num_users, self.num_movies = data_matrix.shape
    self.num_actions = num_actions
    self.context_dim = rank_k

    u, s, vh = np.linalg.svd(data_matrix, full_matrices=False)
    self._u_hat = jnp.asarray(u[:, :rank_k], jnp.float32)    # [Nu, k]
    self._s_hat = jnp.asarray(s[:rank_k], jnp.float32)       # [k]
    self._v_hat = jnp.asarray(vh[:rank_k].T, jnp.float32)    # [M, k]

  def observation_spec(self):
    return {
        GLOBAL_FEATURE_KEY:
            array_spec.ArraySpec((self.context_dim,), np.float32, "global"),
        PER_ARM_FEATURE_KEY:
            array_spec.ArraySpec((self.num_actions, self.context_dim),
                                 np.float32, "per_arm"),
    }

  def action_spec(self):
    return array_spec.BoundedArraySpec((), np.int32, 0,
                                       self.num_actions - 1, "action")

  def _sample_context(self, key, round_):
    k_user, k_movies = jax.random.split(key)
    user = jax.random.randint(k_user, (), 0, self.num_users)
    movies = jax.random.permutation(k_movies,
                                    self.num_movies)[:self.num_actions]
    return {GLOBAL_FEATURE_KEY: self._u_hat[user],
            PER_ARM_FEATURE_KEY: self._v_hat[movies]}

  def _reward(self, context, action, key, round_):
    del key, round_
    arm = context[PER_ARM_FEATURE_KEY][action]
    return jnp.sum(context[GLOBAL_FEATURE_KEY] * self._s_hat * arm)

  def expected_rewards(self, observation):
    return jnp.einsum("...k,...mk->...m",
                      observation[GLOBAL_FEATURE_KEY] * self._s_hat,
                      observation[PER_ARM_FEATURE_KEY])

  def optimal_reward_fn(self, observation):
    return jnp.max(self.expected_rewards(observation), axis=-1)

  def optimal_action_fn(self, observation):
    return jnp.argmax(self.expected_rewards(observation), axis=-1)
