"""Reward-function generators and optimality helpers for bandit suites.

Analogue of ``tf_agents/bandits/environments/environment_utilities.py``:
LinearNormalReward (:33), linear_reward_fn_generator (:57),
sliding_linear_reward_fn_generator (:62), normalized variant (:88),
structured variant (:120), LinearNormalMultipleRewards (:164),
compute_optimal_reward/action (:215,:256), Laplacian builder (:159).

Reward callables here take ``(x, key=None)`` — passing a key adds the
Gaussian noise (the reference's ``enable_noise`` flag becomes "was a key
provided"), keeping them jit/vmap-friendly.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class LinearNormalReward:
  """r(x) = thetaᵀx (+ zero-mean noise of VARIANCE sigma when a key is
  given; the code scales by sqrt(sigma)) — reference :33."""

  def __init__(self, theta, sigma: float = 0.0):
    self.theta = jnp.asarray(theta, jnp.float32)
    self.sigma = float(sigma)

  def __call__(self, x, key=None):
    mu = jnp.einsum("...d,d->...", jnp.asarray(x, jnp.float32), self.theta)
    if key is None or self.sigma == 0.0:
      return mu
    return mu + jnp.sqrt(self.sigma) * jax.random.normal(key, mu.shape)


def linear_reward_fn_generator(theta_list, variance: float):
  return [LinearNormalReward(theta, variance) for theta in theta_list]


def sliding_linear_reward_fn_generator(context_dim: int, num_actions: int,
                                       variance: float):
  """Action k's parameter is the consecutive integers [k, .., k+d-1]
  (reference :62)."""
  return linear_reward_fn_generator(
      [np.arange(i, i + context_dim, dtype=np.float32)
       for i in range(num_actions)], variance)


def normalized_sliding_linear_reward_fn_generator(context_dim: int,
                                                  num_actions: int,
                                                  variance: float):
  """Same, scaled by 1/(context_dim + num_actions) (reference :88)."""
  norm = float(context_dim + num_actions)
  return linear_reward_fn_generator(
      [np.arange(i, i + context_dim, dtype=np.float32) / norm
       for i in range(num_actions)], variance)


def structured_linear_reward_fn_generator(context_dim: int, num_actions: int,
                                          variance: float,
                                          drift_coefficient: float = 0.1,
                                          seed: int = 0):
  """theta_{k+1} = theta_k + drift_coefficient * U[0,1)^d (reference :120).

  The reference draws from global numpy RNG; this takes an explicit seed.
  """
  rng = np.random.default_rng(seed)
  theta = rng.random(context_dim).astype(np.float32)
  thetas = [theta]
  for _ in range(1, num_actions):
    theta = theta + drift_coefficient * rng.random(context_dim).astype(
        np.float32)
    thetas.append(theta)
  return linear_reward_fn_generator(thetas, variance)


class LinearNormalMultipleRewards:
  """Stacked linear objectives for multi-objective bandits (reference :164):
  returns [num_objectives] per context."""

  def __init__(self, thetas, sigma: float = 0.0):
    self.thetas = jnp.asarray(thetas, jnp.float32)  # [m, d]
    self.sigma = float(sigma)

  def __call__(self, x, key=None):
    mu = jnp.einsum("...d,md->...m", jnp.asarray(x, jnp.float32), self.thetas)
    if key is None or self.sigma == 0.0:
      return mu
    return mu + jnp.sqrt(self.sigma) * jax.random.normal(key, mu.shape)


def stack_reward_fns(reward_fns: Sequence[Callable]):
  """[K callables] -> one fn(observation) -> [..., K] expected rewards.

  The per-arm loop the reference runs on host (compute_optimal_reward
  :215-242 calls each fn in Python) is hoisted outside jit: the returned
  closure evaluates every arm and stacks, so the argmax/max below are one
  fused program.
  """
  def all_arms(observation, key=None):
    return jnp.stack([fn(observation) if key is None else fn(observation, key)
                      for fn in reward_fns], axis=-1)
  return all_arms


def compute_optimal_reward(observation, reward_fns: Sequence[Callable]):
  """Noise-free max over arms (reference compute_optimal_reward :215)."""
  return jnp.max(stack_reward_fns(reward_fns)(observation), axis=-1)


def compute_optimal_action(observation, reward_fns: Sequence[Callable],
                           dtype=jnp.int32):
  """Noise-free argmax over arms (reference compute_optimal_action :256)."""
  return jnp.argmax(stack_reward_fns(reward_fns)(observation),
                    axis=-1).astype(dtype)


def build_laplacian_over_ordinal_integer_actions(action_spec) -> jnp.ndarray:
  """Path-graph Laplacian over ordinal actions (reference
  environment_utilities.py:159 -> policies/utils.py): actions k and k±1
  are neighbors; used as a smoothness regularizer on per-arm scores."""
  num_actions = int(action_spec.maximum) - int(action_spec.minimum) + 1
  adj = np.zeros((num_actions, num_actions), np.float32)
  idx = np.arange(num_actions - 1)
  adj[idx, idx + 1] = 1.0
  adj[idx + 1, idx] = 1.0
  lap = np.diag(adj.sum(axis=1)) - adj
  return jnp.asarray(lap)


def context_sampling_fn(context_dim: int, low: int = -10, high: int = 10):
  """Uniform integer contexts as float32 (reference :152), as a
  key-consuming sampler for the JAX envs."""
  def sample(key):
    return jax.random.randint(key, (context_dim,), low, high).astype(
        jnp.float32)
  return sample
