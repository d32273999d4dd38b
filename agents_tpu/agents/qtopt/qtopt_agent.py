"""QtOpt: Q-learning with a CEM action optimizer (continuous actions).

Analogue of ``tf_agents/agents/qtopt/qtopt_agent.py:78`` (Kalashnikov'18):
TD targets use CEM-argmax over the target critic instead of a discrete
max. Full reference surface:

  - ``enable_td3`` (reference :111,:261-290, default True): clipped
    double-Q via TWO *delayed* target networks — the CEM argmax action is
    chosen by the target net, then scored by min(Q_delayed, Q_delayed_2)
    (reference ``_compute_next_q_values``, :712-760). The update chain
    each train step mirrors ``_update_both`` (:433): delayed_2 <- delayed,
    delayed <- target (both hard, every ``delayed_target_update_period``
    steps), then target <- q (tau, every ``target_update_period``).
  - epsilon-greedy collect policy (reference ``_setup_policy``, :389-409:
    ``EpsilonGreedyPolicy(CEMPolicy(target_q_network), epsilon)``); the
    acting CEM policy runs over the *target* network
    (``policy_q_network`` property, :335).
  - ``n_step_update`` via ``to_n_step_transition`` (reference :371-386,
    ``AsNStepTransition``).
  - ``in_graph_bellman_update=False`` (reference :148-176,:712): TD
    targets are read from ``policy_info["target_q"]`` computed out of
    graph (e.g. by a separate bellman-updater job) instead of being
    recomputed here.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from agents_tpu.agents.agent import Agent
from agents_tpu.policies.cem_policy import CEMPolicy
from agents_tpu.policies.wrappers import EpsilonGreedyPolicy, GaussianPolicy
from agents_tpu.trajectories import trajectory as tj
from agents_tpu.utils import common
from agents_tpu.utils.common import LossInfo


@struct.dataclass
class QtOptAgentState:
  q_params: Any
  target_q_params: Any
  opt_state: Any
  train_step: jax.Array
  # TD3-mode delayed targets (None pytrees when enable_td3=False).
  target_q_params_delayed: Any = struct.field(default=None)
  target_q_params_delayed_2: Any = struct.field(default=None)


@struct.dataclass
class QtOptLossExtra:
  td_loss: jax.Array
  td_error: jax.Array


class QtOptAgent(Agent):

  def __init__(self, time_step_spec, action_spec, q_network, optimizer,
               epsilon_greedy: float = 0.1,
               n_step_update: int = 1,
               in_graph_bellman_update: bool = True,
               exploration_noise_std: Optional[float] = None,
               cem_num_samples: int = 32, cem_num_elites: int = 4,
               cem_num_iterations: int = 3,
               enable_td3: bool = True,
               delayed_target_update_period: int = 5,
               td_errors_loss_fn: Callable = common.element_wise_huber_loss,
               gamma: float = 1.0, reward_scale_factor: float = 1.0,
               target_update_tau: float = 1.0,
               target_update_period: int = 1,
               gradient_clipping: Optional[float] = None):
    self.time_step_spec = time_step_spec
    self.action_spec = action_spec
    self.q_network = q_network
    self.optimizer = optimizer
    self.n_step_update = n_step_update
    self.in_graph_bellman_update = in_graph_bellman_update
    self.enable_td3 = enable_td3
    self.delayed_target_update_period = delayed_target_update_period
    self.td_errors_loss_fn = td_errors_loss_fn
    self.gamma = gamma
    self.reward_scale_factor = reward_scale_factor
    self.target_update_tau = target_update_tau
    self.target_update_period = target_update_period
    self.gradient_clipping = gradient_clipping
    self.train_sequence_length = n_step_update + 1

    self.policy = CEMPolicy(time_step_spec, action_spec, q_network,
                            num_samples=cem_num_samples,
                            num_elites=cem_num_elites,
                            num_iterations=cem_num_iterations)
    # Reference collect policy is epsilon-greedy over the CEM policy
    # (_setup_policy:405); Gaussian noise stays available as an opt-in.
    if exploration_noise_std is not None:
      self.collect_policy = GaussianPolicy(self.policy,
                                           scale=exploration_noise_std)
    else:
      self.collect_policy = EpsilonGreedyPolicy(self.policy,
                                                epsilon=epsilon_greedy)

  def init(self, key) -> QtOptAgentState:
    q_params = self.q_network.init_params(key)
    copy = lambda: jax.tree_util.tree_map(jnp.copy, q_params)
    return QtOptAgentState(
        q_params=q_params,
        target_q_params=copy(),
        opt_state=self.optimizer.init(q_params),
        train_step=jnp.zeros((), jnp.int32),
        target_q_params_delayed=copy() if self.enable_td3 else None,
        target_q_params_delayed_2=copy() if self.enable_td3 else None)

  def policy_params(self, agent_state):
    # The acting CEM policy optimizes over the TARGET network (reference
    # policy_q_network property, qtopt_agent.py:335).
    return agent_state.target_q_params

  def _q(self, params, time_steps, actions):
    q, _ = self.q_network.apply(
        params, (time_steps.observation, actions), time_steps.step_type, ())
    return q

  def _compute_next_q_values(self, agent_state, next_time_steps, policy_info,
                             key):
    """Reference ``_compute_next_q_values`` (qtopt_agent.py:712-760)."""
    if not self.in_graph_bellman_update:
      info = policy_info
      if isinstance(info, dict):
        return info["target_q"]
      return info.target_q
    next_action, next_q = self.policy.optimize(
        agent_state.target_q_params, next_time_steps, key)
    if self.enable_td3:
      qd = self._q(agent_state.target_q_params_delayed, next_time_steps,
                   next_action)
      qd2 = self._q(agent_state.target_q_params_delayed_2, next_time_steps,
                    next_action)
      return jnp.minimum(qd, qd2)
    return next_q

  def _loss(self, q_params, agent_state, experience, key, weights=None):
    transition = tj.to_n_step_transition(experience, gamma=self.gamma)
    time_steps = transition.time_step
    actions = transition.action_step.action
    next_time_steps = transition.next_time_step

    next_q = self._compute_next_q_values(
        agent_state, next_time_steps, transition.action_step.info, key)
    rewards = self.reward_scale_factor * next_time_steps.reward
    discounts = self.gamma * next_time_steps.discount
    td_targets = jax.lax.stop_gradient(rewards + discounts * next_q)
    q = self._q(q_params, time_steps, actions)
    td_error = td_targets - q
    per_example = self.td_errors_loss_fn(td_targets, q)
    valid_mask = (~time_steps.is_last()).astype(jnp.float32)
    loss = common.aggregate_losses(
        per_example_loss=per_example * valid_mask, sample_weight=weights)
    return loss, QtOptLossExtra(td_loss=per_example * valid_mask,
                                td_error=td_error * valid_mask)

  def train(self, agent_state: QtOptAgentState, experience, weights=None,
            key: Optional[jax.Array] = None) -> Tuple[QtOptAgentState,
                                                      LossInfo]:
    if key is None:
      key = jax.random.fold_in(jax.random.key(53), agent_state.train_step)
    (loss, extra), grads = jax.value_and_grad(self._loss, has_aux=True)(
        agent_state.q_params, agent_state, experience, key, weights)
    if self.gradient_clipping is not None:
      grads = common.clip_gradient_norms(grads, self.gradient_clipping)
    updates, opt_state = self.optimizer.update(
        grads, agent_state.opt_state, agent_state.q_params)
    q_params = optax.apply_updates(agent_state.q_params, updates)
    train_step = agent_state.train_step + 1

    # Update chain mirrors reference _update_both (:433): delayed_2 takes
    # the OLD delayed, delayed takes the OLD target, target takes the new
    # q — all from pre-update values, matching the sequential TF order.
    delayed, delayed_2 = (agent_state.target_q_params_delayed,
                          agent_state.target_q_params_delayed_2)
    if self.enable_td3:
      delayed_2 = common.periodic_soft_update(
          train_step, self.delayed_target_update_period,
          agent_state.target_q_params_delayed, delayed_2, 1.0)
      delayed = common.periodic_soft_update(
          train_step, self.delayed_target_update_period,
          agent_state.target_q_params, delayed, 1.0)
    target = common.periodic_soft_update(
        train_step, self.target_update_period, q_params,
        agent_state.target_q_params, self.target_update_tau)
    return QtOptAgentState(
        q_params=q_params, target_q_params=target, opt_state=opt_state,
        train_step=train_step, target_q_params_delayed=delayed,
        target_q_params_delayed_2=delayed_2), LossInfo(loss, extra)
