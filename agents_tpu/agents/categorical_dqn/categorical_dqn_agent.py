"""Categorical DQN (C51).

Analogue of ``tf_agents/agents/categorical_dqn/categorical_dqn_agent.py:50``:
distributional TD with projection of the shifted target support onto the
fixed atom grid (:271-520; the Bellamare-Dabney-Munos projection), target
net expectation-argmax for the next action (`_next_q_distribution` :520),
cross-entropy loss.

The projection is a dense [B, atoms, atoms] one-hot-triangle contraction —
an MXU-friendly matmul formulation rather than the reference's
scatter-based `project_distribution`.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from agents_tpu.agents.agent import Agent
from agents_tpu.agents.dqn.dqn_agent import DqnAgentState
from agents_tpu.policies.q_policy import CategoricalQPolicy
from agents_tpu.policies.wrappers import EpsilonGreedyPolicy, GreedyPolicy
from agents_tpu.trajectories import time_step as ts
from agents_tpu.trajectories import trajectory as tj
from agents_tpu.utils import common
from agents_tpu.utils.common import LossInfo


def project_distribution(supports, weights, target_support):
  """Project categorical distributions onto `target_support`.

  supports: [B, N] atom locations of the source distribution.
  weights: [B, N] probabilities at those locations.
  target_support: [M] fixed grid (monotone, evenly spaced).
  Returns [B, M] projected probabilities.

  Dense formulation of the reference's `project_distribution` (:271-430):
  clip source atoms into the grid range, compute per-(target, source)
  triangular weights 1 - |z_j - t_i|/dz clipped to [0,1], then one matmul.
  """
  v_min, v_max = target_support[0], target_support[-1]
  dz = target_support[1] - target_support[0]
  clipped = jnp.clip(supports, v_min, v_max)              # [B, N]
  # [B, M, N] triangle kernel
  diff = jnp.abs(clipped[:, None, :] - target_support[None, :, None])
  tri = jnp.clip(1.0 - diff / dz, 0.0, 1.0)
  return jnp.einsum("bmn,bn->bm", tri, weights)


@struct.dataclass
class C51LossExtra:
  td_loss: jax.Array
  cross_entropy: jax.Array


class CategoricalDqnAgent(Agent):

  def __init__(self, time_step_spec, action_spec, categorical_q_network,
               optimizer, min_q_value: float = -10.0,
               max_q_value: float = 10.0, epsilon_greedy: float = 0.1,
               n_step_update: int = 1, gamma: float = 1.0,
               observation_and_action_constraint_splitter=None,
               reward_scale_factor: float = 1.0,
               target_update_tau: float = 1.0,
               target_update_period: int = 1,
               gradient_clipping: Optional[float] = None):
    self.time_step_spec = time_step_spec
    self.action_spec = action_spec
    # Same guard as DqnAgent (the reference inherits it): the loss
    # indexes atom logits by the raw action value; a nonzero spec
    # minimum (whose QPolicy emits shifted actions) would silently train
    # action a's distribution on action a-1's data, with the top index
    # clamped by take_along_axis instead of erroring.
    import numpy as _np
    for s in jax.tree_util.tree_leaves(
        action_spec, is_leaf=lambda x: hasattr(x, "minimum")):
      if int(_np.asarray(s.minimum)) != 0:
        raise ValueError(
            f"CategoricalDqnAgent action specs should have minimum of "
            f"0, got {s}")
    self.q_network = categorical_q_network
    self.optimizer = optimizer
    self.min_q_value = float(min_q_value)
    self.max_q_value = float(max_q_value)
    self.num_atoms = categorical_q_network.num_atoms
    self.gamma = gamma
    self.reward_scale_factor = reward_scale_factor
    self.target_update_tau = target_update_tau
    self.target_update_period = target_update_period
    self.gradient_clipping = gradient_clipping
    self.splitter = observation_and_action_constraint_splitter
    self.train_sequence_length = n_step_update + 1

    q_policy = CategoricalQPolicy(
        time_step_spec, action_spec, categorical_q_network, min_q_value,
        max_q_value,
        observation_and_action_constraint_splitter=self.splitter)
    self.policy = GreedyPolicy(q_policy)
    self.collect_policy = EpsilonGreedyPolicy(q_policy, epsilon_greedy)
    self._q_policy = q_policy

  @property
  def support(self):
    return jnp.linspace(self.min_q_value, self.max_q_value, self.num_atoms)

  def init(self, key) -> DqnAgentState:
    q_params = self.q_network.init_params(key)
    return DqnAgentState(
        q_params=q_params,
        target_q_params=jax.tree_util.tree_map(jnp.copy, q_params),
        opt_state=self.optimizer.init(q_params),
        train_step=jnp.zeros((), jnp.int32))

  def policy_params(self, agent_state):
    return agent_state.q_params

  def _loss(self, q_params, agent_state, experience, weights=None):
    transition = tj.to_n_step_transition(experience, gamma=self.gamma)
    time_steps = transition.time_step
    actions = transition.action_step.action
    next_time_steps = transition.next_time_step
    support = self.support

    # Target distribution (reference `_next_q_distribution` :520).
    next_obs = next_time_steps.observation
    mask = None
    if self.splitter is not None:
      next_obs, mask = self.splitter(next_obs)
    target_logits, _ = self.q_network.apply(
        agent_state.target_q_params, next_obs, next_time_steps.step_type, ())
    target_probs = jax.nn.softmax(target_logits, axis=-1)  # [B, A, N]
    target_q = jnp.sum(target_probs * support, axis=-1)    # [B, A]
    if mask is not None:
      target_q = jnp.where(mask, target_q, -1e9)
    best = jnp.argmax(target_q, axis=-1)                   # [B]
    next_dist = jnp.take_along_axis(
        target_probs, best[:, None, None], axis=1).squeeze(1)  # [B, N]

    rewards = self.reward_scale_factor * next_time_steps.reward
    discounts = self.gamma * next_time_steps.discount
    shifted = rewards[:, None] + discounts[:, None] * support[None, :]
    projected = jax.lax.stop_gradient(
        project_distribution(shifted, next_dist, support))

    obs = time_steps.observation
    if self.splitter is not None:
      obs, _ = self.splitter(obs)
    logits, _ = self.q_network.apply(q_params, obs, time_steps.step_type, ())
    chosen_logits = jnp.take_along_axis(
        logits, actions.astype(jnp.int32)[:, None, None].repeat(
            self.num_atoms, axis=2), axis=1).squeeze(1)    # [B, N]
    ce = -jnp.sum(projected * jax.nn.log_softmax(chosen_logits, -1), -1)

    valid_mask = (~time_steps.is_last()).astype(jnp.float32)
    ce = ce * valid_mask
    loss = common.aggregate_losses(per_example_loss=ce,
                                   sample_weight=weights)
    return loss, C51LossExtra(td_loss=ce, cross_entropy=ce)

  def train(self, agent_state: DqnAgentState, experience,
            weights=None) -> Tuple[DqnAgentState, LossInfo]:
    (loss, extra), grads = jax.value_and_grad(self._loss, has_aux=True)(
        agent_state.q_params, agent_state, experience, weights)
    if self.gradient_clipping is not None:
      grads = common.clip_gradient_norms(grads, self.gradient_clipping)
    updates, opt_state = self.optimizer.update(
        grads, agent_state.opt_state, agent_state.q_params)
    q_params = optax.apply_updates(agent_state.q_params, updates)
    train_step = agent_state.train_step + 1
    target_q_params = common.periodic_soft_update(
        train_step, self.target_update_period, q_params,
        agent_state.target_q_params, self.target_update_tau)
    return DqnAgentState(
        q_params=q_params, target_q_params=target_q_params,
        opt_state=opt_state, train_step=train_step), LossInfo(loss, extra)
