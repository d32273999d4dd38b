"""Linear bandit agents: LinUCB and Linear Thompson Sampling.

Analogue of ``tf_agents/bandits/agents/linear_bandit_agent.py:158`` (the
shared base of LinUcbAgent / LinearThompsonSamplingAgent):
  - per-arm sufficient statistics A_k = lambda I + sum x xᵀ, b_k = sum r x
  - batched rank-B updates as ONE einsum pair per train call (the
    reference loops per-arm with scatter; here the [B]->[K] routing is a
    one-hot contraction that lands on the MXU)
  - optional forgetting factor gamma (reference :127)
  - distributed training: pass `axis_name` to psum the (dA, db) deltas —
    the collective the reference implements with strategy.merge_call
    all-reduce (:614-680)

The exploration policy lives in
``bandits/policies/linear_bandit_policy.py``.
"""
from __future__ import annotations

import enum
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from agents_tpu.agents.agent import Agent
from agents_tpu.bandits.policies.linear_bandit_policy import (
    ExplorationStrategy, LinearBanditPolicy)
from agents_tpu.utils.common import LossInfo


@struct.dataclass
class LinearBanditState:
  a_mat: jax.Array   # [K, d, d]
  b_vec: jax.Array   # [K, d]
  num_samples: jax.Array  # [K]
  train_step: jax.Array


class LinearBanditAgent(Agent):

  def __init__(self, exploration_strategy: ExplorationStrategy,
               time_step_spec, action_spec, alpha: float = 1.0,
               gamma: float = 1.0, tikhonov_weight: float = 1.0,
               axis_name: Optional[str] = None, dtype=jnp.float32):
    self.time_step_spec = time_step_spec
    self.action_spec = action_spec
    self.num_actions = action_spec.num_values
    obs_spec = time_step_spec.observation
    self.context_dim = int(np.prod(obs_spec.shape))
    self.alpha = alpha
    self.gamma = gamma
    self.tikhonov_weight = tikhonov_weight
    self.axis_name = axis_name
    self.dtype = dtype
    self.train_sequence_length = None  # length-1 episodes

    self.policy = LinearBanditPolicy(
        time_step_spec, action_spec, exploration_strategy, alpha=alpha)
    self.collect_policy = self.policy

  def init(self, key) -> LinearBanditState:
    del key
    K, d = self.num_actions, self.context_dim
    eye = jnp.eye(d, dtype=self.dtype) * self.tikhonov_weight
    return LinearBanditState(
        a_mat=jnp.broadcast_to(eye, (K, d, d)).copy(),
        b_vec=jnp.zeros((K, d), self.dtype),
        num_samples=jnp.zeros((K,), self.dtype),
        train_step=jnp.zeros((), jnp.int32))

  def policy_params(self, agent_state):
    return agent_state

  def train(self, agent_state: LinearBanditState, experience,
            weights=None) -> Tuple[LinearBanditState, LossInfo]:
    """experience: Trajectory with [B] or [B, 1] frames (one bandit round
    per frame)."""
    obs = experience.observation
    actions = experience.action
    rewards = experience.reward
    # Accept [B, 1, ...] (time-stacked length-1 episodes) or [B, ...].
    if experience.step_type.ndim == 2:
      obs = jax.tree_util.tree_map(lambda x: x[:, 0], obs)
      actions = actions[:, 0]
      rewards = rewards[:, 0]
    x = obs.reshape(obs.shape[0], -1).astype(self.dtype)   # [B, d]
    r = rewards.astype(self.dtype)                          # [B]
    onehot = jax.nn.one_hot(actions.astype(jnp.int32),
                            self.num_actions, dtype=self.dtype)  # [B, K]
    if weights is not None:
      onehot = onehot * weights[:, None]

    delta_a = jnp.einsum("bk,bi,bj->kij", onehot, x, x)
    delta_b = jnp.einsum("bk,b,bi->ki", onehot, r, x)
    delta_n = jnp.sum(onehot, axis=0)
    if self.axis_name is not None:
      delta_a = jax.lax.psum(delta_a, self.axis_name)
      delta_b = jax.lax.psum(delta_b, self.axis_name)
      delta_n = jax.lax.psum(delta_n, self.axis_name)

    g = self.gamma
    eye = jnp.eye(self.context_dim, dtype=self.dtype) * self.tikhonov_weight
    a_mat = g * agent_state.a_mat + (1 - g) * eye[None] + delta_a
    b_vec = g * agent_state.b_vec + delta_b

    # "Loss" = mean squared prediction error before the update (diagnostic;
    # the reference reports -reward as loss).
    loss = -jnp.mean(r)
    new_state = LinearBanditState(
        a_mat=a_mat, b_vec=b_vec,
        num_samples=agent_state.num_samples + delta_n,
        train_step=agent_state.train_step + 1)
    return new_state, LossInfo(loss=loss, extra=())


class LinUcbAgent(LinearBanditAgent):
  """reference lin_ucb_agent.py."""

  def __init__(self, time_step_spec, action_spec, alpha: float = 1.0,
               gamma: float = 1.0, tikhonov_weight: float = 1.0, **kwargs):
    super().__init__(ExplorationStrategy.optimistic, time_step_spec,
                     action_spec, alpha=alpha, gamma=gamma,
                     tikhonov_weight=tikhonov_weight, **kwargs)


class LinearThompsonSamplingAgent(LinearBanditAgent):
  """reference linear_thompson_sampling_agent.py."""

  def __init__(self, time_step_spec, action_spec, alpha: float = 1.0,
               gamma: float = 1.0, tikhonov_weight: float = 1.0, **kwargs):
    super().__init__(ExplorationStrategy.sampling, time_step_spec,
                     action_spec, alpha=alpha, gamma=gamma,
                     tikhonov_weight=tikhonov_weight, **kwargs)
