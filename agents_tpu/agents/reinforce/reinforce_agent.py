"""REINFORCE.

Analogue of ``tf_agents/agents/reinforce/reinforce_agent.py:121``:
Monte-Carlo returns, optional value-network baseline, entropy
regularization, and the reference's masking of post-boundary frames.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from agents_tpu.agents.agent import Agent
from agents_tpu.policies.actor_policy import ActorPolicy
from agents_tpu.policies.wrappers import GreedyPolicy
from agents_tpu.trajectories import time_step as ts
from agents_tpu.utils import common, value_ops
from agents_tpu.utils.common import LossInfo


@struct.dataclass
class ReinforceAgentState:
  actor_params: Any
  value_params: Any
  opt_state: Any
  train_step: jax.Array


@struct.dataclass
class ReinforceLossExtra:
  policy_gradient_loss: jax.Array
  value_estimation_loss: jax.Array


class ReinforceAgent(Agent):

  def __init__(self, time_step_spec, action_spec, actor_network, optimizer,
               value_network=None, value_estimation_loss_coef: float = 0.2,
               gamma: float = 1.0, normalize_returns: bool = True,
               entropy_regularization: Optional[float] = None,
               gradient_clipping: Optional[float] = None):
    self.time_step_spec = time_step_spec
    self.action_spec = action_spec
    self.actor_network = actor_network
    self.value_network = value_network
    self.optimizer = optimizer
    self.value_estimation_loss_coef = value_estimation_loss_coef
    self.gamma = gamma
    self.normalize_returns = normalize_returns
    self.entropy_regularization = entropy_regularization
    self.gradient_clipping = gradient_clipping
    self.train_sequence_length = None  # full episodes [B, T]

    self.collect_policy = ActorPolicy(time_step_spec, action_spec,
                                      actor_network)
    self.policy = GreedyPolicy(self.collect_policy)

  def init(self, key) -> ReinforceAgentState:
    k_a, k_v = jax.random.split(key)
    actor_params = self.actor_network.init_params(k_a)
    value_params = (self.value_network.init_params(k_v)
                    if self.value_network else ())
    params = (actor_params, value_params)
    return ReinforceAgentState(
        actor_params=actor_params, value_params=value_params,
        opt_state=self.optimizer.init(params),
        train_step=jnp.zeros((), jnp.int32))

  def policy_params(self, agent_state):
    return agent_state.actor_params

  def _loss(self, params, experience, returns, mask):
    actor_params, value_params = params
    obs = experience.observation
    step_type = experience.step_type
    B, T = mask.shape
    flat = lambda x: jax.tree_util.tree_map(
        lambda t: t.reshape((B * T,) + t.shape[2:]), x)
    dist, _ = self.actor_network.apply(
        actor_params, flat(obs), flat(step_type), ())
    log_prob = common.log_probability(
        dist, flat(experience.action)).reshape(B, T)

    # Reference normalizes by the number of COMPLETE episodes
    # (:327-352: sum(is_last)) — counting FIRST frames would include the
    # trailing partial episode the training mask excludes.
    num_episodes = jnp.maximum(
        jnp.sum((experience.next_step_type == ts.StepType.LAST).astype(
            jnp.float32)), 1.0)

    advantage = returns
    value_loss = jnp.zeros(())
    if self.value_network:
      values, _ = self.value_network.apply(
          value_params, flat(obs), flat(step_type), ())
      values = values.reshape(B, T)
      advantage = returns - jax.lax.stop_gradient(values)
      value_loss = self.value_estimation_loss_coef * jnp.sum(
          jnp.square(returns - values) * mask) / num_episodes

    if self.normalize_returns:
      denom = jnp.maximum(jnp.sum(mask), 1.0)
      mean = jnp.sum(advantage * mask) / denom
      var = jnp.sum(jnp.square(advantage - mean) * mask) / denom
      advantage = (advantage - mean) / (jnp.sqrt(var) + 1e-6)

    pg_loss = -jnp.sum(log_prob * advantage * mask) / num_episodes

    entropy_loss = jnp.zeros(())
    if self.entropy_regularization:
      entropy = common.entropy(dist).reshape(B, T)
      entropy_loss = -self.entropy_regularization * jnp.sum(
          entropy * mask) / num_episodes

    total = pg_loss + value_loss + entropy_loss
    return total, ReinforceLossExtra(policy_gradient_loss=pg_loss,
                                     value_estimation_loss=value_loss)

  def train(self, agent_state: ReinforceAgentState, experience, weights=None,
            key=None) -> Tuple[ReinforceAgentState, LossInfo]:
    """experience: Trajectory [B, T] of (ideally whole) episodes."""
    del weights, key
    # Zero the discount at episode-final transitions so MC returns
    # restart at boundaries even for truncated (discount-1) episodes
    # (reference reinforce_agent.py:258-266 masks with
    # next_step_type != LAST "in cases where episodes are truncated").
    boundary = (experience.next_step_type ==
                ts.StepType.LAST).astype(experience.discount.dtype)
    discounts = experience.discount * self.gamma * (1.0 - boundary)
    rewards_tm = jnp.swapaxes(experience.reward, 0, 1)
    discounts_tm = jnp.swapaxes(discounts, 0, 1)
    returns = jnp.swapaxes(
        value_ops.discounted_return(rewards_tm, discounts_tm), 0, 1)
    mask = (experience.step_type != ts.StepType.LAST).astype(jnp.float32)
    # Zero-weight frames AFTER the last completed episode in each row:
    # a trailing partial episode's returns are cut at the window edge
    # with no bootstrap — training on them reinforces truncation noise
    # (reference :339-352, reverse-cumsum of is_last).
    is_last = (experience.next_step_type ==
               ts.StepType.LAST).astype(jnp.float32)
    remaining_lasts = jnp.cumsum(is_last[:, ::-1], axis=1)[:, ::-1]
    mask = mask * (remaining_lasts > 0).astype(jnp.float32)

    params = (agent_state.actor_params, agent_state.value_params)
    (loss, extra), grads = jax.value_and_grad(self._loss, has_aux=True)(
        params, experience, returns, mask)
    if self.gradient_clipping is not None:
      grads = common.clip_gradient_norms(grads, self.gradient_clipping)
    updates, opt_state = self.optimizer.update(
        grads, agent_state.opt_state, params)
    actor_params, value_params = optax.apply_updates(params, updates)
    return ReinforceAgentState(
        actor_params=actor_params, value_params=value_params,
        opt_state=opt_state,
        train_step=agent_state.train_step + 1), LossInfo(loss, extra)
