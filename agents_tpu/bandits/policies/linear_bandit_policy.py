"""Linear bandit exploration policy (UCB / Thompson sampling).

Analogue of ``tf_agents/bandits/policies/linear_bandit_policy.py:585``:
scores each arm from the sufficient statistics (A_k, b_k):
  UCB:  xᵀ theta_k + alpha sqrt(xᵀ A_k^{-1} x)
  TS:   xᵀ theta_tilde,  theta_tilde ~ N(theta_k, alpha^2 A_k^{-1})
Solves are batched Cholesky over arms (one [K,d,d] factorization per
call); the reference's conjugate-gradient path is available through
``linalg.conjugate_gradient``.
"""
from __future__ import annotations

import enum
from typing import Any

import jax
import jax.numpy as jnp

from agents_tpu import distributions as dist_lib
from agents_tpu.policies.policy import Policy
from agents_tpu.trajectories import policy_step as ps


class ExplorationStrategy(enum.Enum):
  """reference linear_bandit_agent.py ExplorationPolicy."""
  optimistic = 1  # LinUCB
  sampling = 2    # Thompson sampling


class LinearBanditPolicy(Policy):

  def __init__(self, time_step_spec, action_spec, strategy, alpha=1.0,
               emit_log_probability=False):
    super().__init__(time_step_spec, action_spec, clip=False)
    self.strategy = strategy
    self.alpha = alpha
    self.num_actions = action_spec.num_values

  def _scores(self, agent_state, observation, key=None):
    x = observation.reshape(observation.shape[0], -1).astype(
        agent_state.a_mat.dtype)                     # [B, d]
    chol = jnp.linalg.cholesky(agent_state.a_mat)    # [K, d, d]
    theta = jax.scipy.linalg.cho_solve(
        (chol, True), agent_state.b_vec[..., None])[..., 0]  # [K, d]
    est = jnp.einsum("bd,kd->bk", x, theta)          # [B, K]

    if self.strategy == ExplorationStrategy.optimistic:
      # solve A_k z = x for each arm/batch: z [K, B, d]
      z = jax.scipy.linalg.cho_solve(
          (chol, True),
          jnp.broadcast_to(x.T[None], (chol.shape[0],) + x.T.shape))
      var = jnp.einsum("bd,kdb->bk", x, z)
      return est + self.alpha * jnp.sqrt(jnp.maximum(var, 0.0))

    # Thompson sampling: theta_tilde = theta + alpha * L^{-T} eps.
    K, d = theta.shape
    eps = jax.random.normal(key, (K, d), theta.dtype)
    # Sample with covariance A^{-1}: solve L^T u = eps.
    u = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(chol, -1, -2), eps[..., None], lower=False)[..., 0]
    theta_tilde = theta + self.alpha * u
    return jnp.einsum("bd,kd->bk", x, theta_tilde)

  def _action(self, params, time_step, state, key):
    k_ts, _ = jax.random.split(key)
    scores = self._scores(params, time_step.observation, k_ts)
    action = jnp.argmax(scores, axis=-1).astype(
        jnp.dtype(self.action_spec.dtype))
    return ps.PolicyStep(action=action, state=state, info=())

  def _distribution(self, params, time_step, state):
    if self.strategy != ExplorationStrategy.optimistic:
      # TS draws a fresh theta_tilde per action; a keyless distribution
      # would freeze the perturbation (a biased greedy that can starve
      # arms) — only action() carries the RNG stream.
      raise NotImplementedError(
          "Thompson-sampling LinearBanditPolicy has no closed-form "
          "action distribution; use action() (the per-call theta draw "
          "IS the exploration).")
    scores = self._scores(params, time_step.observation)
    return ps.PolicyStep(
        action=dist_lib.Categorical(scores * 1e6), state=state, info=())
