"""DQN / DDQN / D3QN agents.

Analogue of ``tf_agents/agents/dqn/dqn_agent.py:82,649,704``:
  - epsilon-greedy collect + greedy eval policies (:340)
  - target network with periodic polyak updates (`_get_target_updater`
    :385, via common.soft_variables_update)
  - TD loss masks boundary transitions (`valid_mask` :515) and aggregates
    with 1/N batch weighting (:534)
  - n-step targets via `to_n_step_transition` (data_converter.py:577)
  - action masking via observation_and_action_constraint_splitter (:141)

The whole train step — gather, forward, backward, optimizer, periodic
target update — is one pure function; XLA fuses it into a single TPU
program.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from agents_tpu.agents.agent import Agent
from agents_tpu.policies.q_policy import QPolicy
from agents_tpu.policies.wrappers import EpsilonGreedyPolicy, GreedyPolicy
from agents_tpu.trajectories import time_step as ts
from agents_tpu.trajectories import trajectory as tj
from agents_tpu.utils import common
from agents_tpu.utils.common import LossInfo


class _ScheduledQPolicy(QPolicy):
  """QPolicy whose params are {"q": net_params, "train_step": step} so an
  epsilon-decay schedule can read the step at act time."""

  def q_values(self, params, time_step, state=()):
    return super().q_values(params["q"], time_step, state)


@struct.dataclass
class DqnAgentState:
  q_params: Any
  target_q_params: Any
  opt_state: Any
  train_step: jax.Array


@struct.dataclass
class DqnLossExtra:
  td_loss: jax.Array
  td_error: jax.Array


class DqnAgent(Agent):
  """Vanilla DQN (max over target net)."""

  def __init__(self, time_step_spec, action_spec, q_network,
               optimizer: optax.GradientTransformation,
               epsilon_greedy: float = 0.1,
               n_step_update: int = 1,
               boltzmann_temperature: Optional[float] = None,
               observation_and_action_constraint_splitter=None,
               td_errors_loss_fn: Callable = common.element_wise_huber_loss,
               gamma: float = 1.0,
               reward_scale_factor: float = 1.0,
               target_update_tau: float = 1.0,
               target_update_period: int = 1,
               gradient_clipping: Optional[float] = None,
               train_sequence_length: Optional[int] = None):
    self.time_step_spec = time_step_spec
    self.action_spec = action_spec
    # The TD loss indexes Q rows by the raw action value; a nonzero spec
    # minimum would silently mis-index (the reference raises the same
    # way, dqn_agent.py:314-317).
    for s in jax.tree_util.tree_leaves(
        action_spec, is_leaf=lambda x: hasattr(x, "minimum")):
      if int(np.asarray(s.minimum)) != 0:
        raise ValueError(
            f"DqnAgent action specs should have minimum of 0, got {s}")
    self.q_network = q_network
    self.optimizer = optimizer
    self.epsilon_greedy = epsilon_greedy
    self.n_step_update = n_step_update
    self.td_errors_loss_fn = td_errors_loss_fn
    self.gamma = gamma
    self.reward_scale_factor = reward_scale_factor
    self.target_update_tau = target_update_tau
    self.target_update_period = target_update_period
    self.gradient_clipping = gradient_clipping
    self.splitter = observation_and_action_constraint_splitter
    self.train_sequence_length = (train_sequence_length
                                  or n_step_update + 1)

    q_policy = QPolicy(time_step_spec, action_spec, q_network,
                       observation_and_action_constraint_splitter=self.splitter)
    self.policy = GreedyPolicy(q_policy)
    if boltzmann_temperature is not None:
      from agents_tpu.policies.wrappers import BoltzmannPolicy
      self.collect_policy = BoltzmannPolicy(q_policy, boltzmann_temperature)
      self._collect_carries_step = False
    else:
      # Epsilon-greedy collect params are ALWAYS {"q", "train_step"} —
      # one stable pytree contract for checkpoints and saved artifacts
      # regardless of whether epsilon is a constant or a decay schedule
      # (reference uses tf polynomial_decay(train_step),
      # examples/dqn/mnih15 :165-171). A callable epsilon reads the
      # step; a constant ignores it.
      sched_q_policy = _ScheduledQPolicy(
          time_step_spec, action_spec, q_network,
          observation_and_action_constraint_splitter=self.splitter)
      eps = (epsilon_greedy if callable(epsilon_greedy)
             else lambda _: epsilon_greedy)
      self.collect_policy = EpsilonGreedyPolicy(
          sched_q_policy, lambda p: eps(p["train_step"]))
      self._collect_carries_step = True
    self._q_policy = q_policy

  # -- lifecycle -----------------------------------------------------------
  def init(self, key) -> DqnAgentState:
    q_params = self.q_network.init_params(key)
    return DqnAgentState(
        q_params=q_params,
        target_q_params=jax.tree_util.tree_map(jnp.copy, q_params),
        opt_state=self.optimizer.init(q_params),
        train_step=jnp.zeros((), jnp.int32),
    )

  def policy_params(self, agent_state):
    return agent_state.q_params

  def collect_policy_params(self, agent_state):
    if self._collect_carries_step:
      return {"q": agent_state.q_params,
              "train_step": agent_state.train_step}
    return agent_state.q_params

  # -- Q computation hooks (overridden by DDQN) -----------------------------
  def _next_best_q(self, agent_state, next_time_steps):
    """max_a Q_target(s', a) with optional action mask
    (dqn_agent.py:604-647)."""
    obs = next_time_steps.observation
    mask = None
    if self.splitter is not None:
      obs, mask = self.splitter(obs)
    q_next, _ = self.q_network.apply(
        agent_state.target_q_params, obs, next_time_steps.step_type, ())
    if mask is not None:
      q_next = jnp.where(mask, q_next, -1e9)
    return jnp.max(q_next, axis=-1)

  # -- train ---------------------------------------------------------------
  def _loss(self, q_params, agent_state, experience, weights=None):
    """experience: Trajectory [B, T=n_step+1] (feed-forward) or [B, T]
    sequences for recurrent q networks (reference q_rnn training path:
    the whole sequence unrolls with reset masking and TD applies at every
    adjacent pair, dqn_agent.py with train_sequence_length > 2)."""
    if self.q_network.state_spec != ():
      return self._sequence_loss(q_params, agent_state, experience, weights)
    transition = tj.to_n_step_transition(experience, gamma=self.gamma)
    time_steps = transition.time_step
    actions = transition.action_step.action
    next_time_steps = transition.next_time_step

    obs = time_steps.observation
    if self.splitter is not None:
      obs, _ = self.splitter(obs)
    q_all, _ = self.q_network.apply(q_params, obs, time_steps.step_type, ())
    q_values = common.index_with_actions(q_all, actions)

    next_q = self._next_best_q(agent_state, next_time_steps)
    rewards = self.reward_scale_factor * next_time_steps.reward
    discounts = self.gamma * next_time_steps.discount
    td_targets = jax.lax.stop_gradient(rewards + discounts * next_q)
    td_error = td_targets - q_values
    td_loss = self.td_errors_loss_fn(td_targets, q_values)

    valid_mask = (~time_steps.is_last()).astype(jnp.float32)
    td_error = valid_mask * td_error
    td_loss = valid_mask * td_loss

    loss = common.aggregate_losses(per_example_loss=td_loss,
                                   sample_weight=weights)
    return loss, DqnLossExtra(td_loss=td_loss, td_error=td_error)

  def _seq_next_best_q(self, q_all_online, target_all, action_mask):
    """Next-state value from the [B, T, A] unrolled online/target Q.
    Base DQN: masked max over the target net; DdqnAgent overrides with
    online-argmax / target-eval decoupling (dqn_agent.py:649)."""
    if action_mask is not None:
      target_all = jnp.where(action_mask, target_all, -1e9)
    return jnp.max(target_all, axis=-1)                    # [B, T]

  def _sequence_loss(self, q_params, agent_state, experience, weights=None):
    """TD loss over full sequences for recurrent Q networks. The LSTM
    unrolls once over [B, T] with FIRST-step reset masking; TD pairs are
    (t, t+1) frames, masked at episode boundaries. Action-mask splitting
    and the DQN/DDQN target rule go through the same hooks as the
    feed-forward path."""
    obs = experience.observation
    action_mask = None
    if self.splitter is not None:
      obs, action_mask = self.splitter(obs)
    step_type = experience.step_type
    q_all, _ = self.q_network.apply(
        q_params, obs, step_type, None)                    # [B, T, A]
    q_taken = common.index_with_actions(q_all, experience.action)

    target_all, _ = self.q_network.apply(
        agent_state.target_q_params, obs, step_type, None)
    next_q = self._seq_next_best_q(q_all, target_all, action_mask)

    rewards = self.reward_scale_factor * experience.reward[:, :-1]
    discounts = self.gamma * experience.discount[:, :-1]
    td_targets = jax.lax.stop_gradient(
        rewards + discounts * next_q[:, 1:])
    td_error = td_targets - q_taken[:, :-1]
    td_loss = self.td_errors_loss_fn(td_targets, q_taken[:, :-1])

    valid = (experience.step_type[:, :-1] != ts.StepType.LAST).astype(
        jnp.float32)
    td_loss = td_loss * valid
    td_error = td_error * valid
    # Sum over time, mean over batch (reference sums the time dim,
    # dqn_agent.py:520-530).
    per_example = jnp.sum(td_loss, axis=1)
    loss = common.aggregate_losses(per_example_loss=per_example,
                                   sample_weight=weights)
    return loss, DqnLossExtra(td_loss=td_loss, td_error=td_error)

  def train(self, agent_state: DqnAgentState, experience,
            weights=None) -> Tuple[DqnAgentState, LossInfo]:
    (loss, extra), grads = jax.value_and_grad(
        self._loss, has_aux=True)(
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
    new_state = DqnAgentState(
        q_params=q_params, target_q_params=target_q_params,
        opt_state=opt_state, train_step=train_step)
    return new_state, LossInfo(loss=loss, extra=extra)


class DdqnAgent(DqnAgent):
  """Double DQN: online-net argmax, target-net evaluation
  (dqn_agent.py:649)."""

  def _next_best_q(self, agent_state, next_time_steps):
    obs = next_time_steps.observation
    mask = None
    if self.splitter is not None:
      obs, mask = self.splitter(obs)
    q_online, _ = self.q_network.apply(
        agent_state.q_params, obs, next_time_steps.step_type, ())
    if mask is not None:
      q_online = jnp.where(mask, q_online, -1e9)
    best = jnp.argmax(q_online, axis=-1)
    q_target, _ = self.q_network.apply(
        agent_state.target_q_params, obs, next_time_steps.step_type, ())
    return common.index_with_actions(q_target, best)

  def _seq_next_best_q(self, q_all_online, target_all, action_mask):
    """Recurrent Double-DQN target: argmax under the ONLINE unroll,
    value from the TARGET unroll (same decoupling as _next_best_q —
    without this override the recurrent path would silently fall back
    to vanilla-DQN maximization-bias targets)."""
    if action_mask is not None:
      q_all_online = jnp.where(action_mask, q_all_online, -1e9)
    best = jnp.argmax(jax.lax.stop_gradient(q_all_online), axis=-1)
    return common.index_with_actions(target_all, best)


# D3QN = Double DQN + a dueling q_network (reference D3qnAgent :704 is just
# DdqnAgent constructed with DuelingQNetwork).
D3qnAgent = DdqnAgent
