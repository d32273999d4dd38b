"""Bandit metrics: regret, suboptimal arms, distance-from-greedy.

Analogue of ``tf_agents/bandits/metrics/tf_metrics.py``:
RegretMetric (:34), SuboptimalArmsMetric (:85),
ConstraintViolationsMetric (:130), DistanceFromGreedyMetric (:182) — as
pytree accumulators compatible with the JaxDriver observer protocol.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from agents_tpu.metrics.jax_metrics import Metric


class RegretMetric(Metric):
  """Mean per-round regret = optimal expected reward - received reward."""
  name = "RegretMetric"

  def __init__(self, baseline_reward_fn: Callable):
    self.baseline_reward_fn = baseline_reward_fn

  def init(self, batch_size: int):
    return (jnp.zeros(()), jnp.zeros(()))  # (sum, count)

  def update(self, state, traj):
    total, count = state
    optimal = self.baseline_reward_fn(traj.observation)
    # Only LAST frames carry the round's reward.
    valid = traj.is_last().astype(jnp.float32)
    regret = (optimal - traj.reward) * valid
    return total + jnp.sum(regret), count + jnp.sum(valid)

  def result(self, state):
    total, count = state
    return total / jnp.maximum(count, 1.0)


class SuboptimalArmsMetric(Metric):
  """Fraction of rounds where a suboptimal arm was pulled."""
  name = "SuboptimalArmsMetric"

  def __init__(self, optimal_action_fn: Callable):
    self.optimal_action_fn = optimal_action_fn

  def init(self, batch_size: int):
    return (jnp.zeros(()), jnp.zeros(()))

  def update(self, state, traj):
    total, count = state
    best = self.optimal_action_fn(traj.observation)
    valid = traj.is_last().astype(jnp.float32)
    subopt = (traj.action != best).astype(jnp.float32) * valid
    return total + jnp.sum(subopt), count + jnp.sum(valid)

  def result(self, state):
    total, count = state
    return total / jnp.maximum(count, 1.0)


class ConstraintViolationsMetric(Metric):
  """Mean violations of an action-feasibility constraint fn
  (reference :130)."""
  name = "ConstraintViolationsMetric"

  def __init__(self, constraint_fn: Callable):
    """constraint_fn(observation, action) -> violation in [0, 1]."""
    self.constraint_fn = constraint_fn

  def init(self, batch_size: int):
    return (jnp.zeros(()), jnp.zeros(()))

  def update(self, state, traj):
    total, count = state
    valid = traj.is_last().astype(jnp.float32)
    v = self.constraint_fn(traj.observation, traj.action) * valid
    return total + jnp.sum(v), count + jnp.sum(valid)

  def result(self, state):
    total, count = state
    return total / jnp.maximum(count, 1.0)


class DistanceFromGreedyMetric(Metric):
  """How 'safely' the policy explores: mean gap between the highest
  *estimated* reward and the estimated reward of the action actually taken
  (reference tf_metrics.py:182 — belief-relative, unlike regret)."""
  name = "DistanceFromGreedyMetric"

  def __init__(self, estimated_reward_fn: Callable):
    """estimated_reward_fn(observation) -> [..., num_actions] estimates
    (e.g. the agent's reward network with current params)."""
    self.estimated_reward_fn = estimated_reward_fn

  def init(self, batch_size: int):
    return (jnp.zeros(()), jnp.zeros(()))

  def update(self, state, traj):
    total, count = state
    est = self.estimated_reward_fn(traj.observation)
    best = jnp.max(est, axis=-1)
    taken = jnp.take_along_axis(
        est, traj.action[..., None].astype(jnp.int32), axis=-1)[..., 0]
    valid = traj.is_last().astype(jnp.float32)
    return (total + jnp.sum((best - taken) * valid),
            count + jnp.sum(valid))

  def result(self, state):
    total, count = state
    return total / jnp.maximum(count, 1.0)
