"""Behavioral cloning.

Analogue of ``tf_agents/agents/behavioral_cloning/
behavioral_cloning_agent.py:65``: supervised loss on expert experience —
negative log-likelihood for distribution networks, cross-entropy for
Q/logit networks (the reference's default `loss_fn` behavior).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from agents_tpu.agents.agent import Agent
from agents_tpu.policies.actor_policy import ActorPolicy
from agents_tpu.policies.q_policy import QPolicy
from agents_tpu.policies.wrappers import EpsilonGreedyPolicy, GreedyPolicy
from agents_tpu.specs import array_spec
from agents_tpu.utils import common
from agents_tpu.utils.common import LossInfo


@struct.dataclass
class BcAgentState:
  params: Any
  opt_state: Any
  train_step: jax.Array


class BehavioralCloningAgent(Agent):
  """`network` is either an actor-distribution network (continuous or
  discrete) or a Q-network over discrete actions."""

  def __init__(self, time_step_spec, action_spec, network, optimizer,
               network_is_distribution: bool = True,
               gradient_clipping: Optional[float] = None):
    self.time_step_spec = time_step_spec
    self.action_spec = action_spec
    self.network = network
    self.optimizer = optimizer
    self.network_is_distribution = network_is_distribution
    self.gradient_clipping = gradient_clipping
    self.train_sequence_length = None  # any [B, T]
    if not network_is_distribution:
      # Q-network path indexes logits by the raw action value — same
      # zero-minimum requirement as DqnAgent.
      import numpy as _np
      for s in jax.tree_util.tree_leaves(
          action_spec, is_leaf=lambda x: hasattr(x, "minimum")):
        if hasattr(s, "minimum") and int(_np.asarray(s.minimum)) != 0:
          raise ValueError(
              f"BehavioralCloningAgent with a logits network requires "
              f"action spec minimum 0, got {s}")

    if network_is_distribution:
      self.collect_policy = ActorPolicy(time_step_spec, action_spec, network)
      self.policy = GreedyPolicy(self.collect_policy)
    else:
      q_policy = QPolicy(time_step_spec, action_spec, network)
      self.policy = GreedyPolicy(q_policy)
      self.collect_policy = EpsilonGreedyPolicy(q_policy, 0.1)

  def init(self, key) -> BcAgentState:
    params = self.network.init_params(key)
    return BcAgentState(params=params,
                        opt_state=self.optimizer.init(params),
                        train_step=jnp.zeros((), jnp.int32))

  def policy_params(self, agent_state):
    return agent_state.params

  def _loss(self, params, experience, weights=None):
    obs = experience.observation
    actions = experience.action
    step_type = experience.step_type
    # Flatten any [B, T] outer dims into frames.
    leading = step_type.shape
    flat = lambda x: jax.tree_util.tree_map(
        lambda t: t.reshape((-1,) + t.shape[len(leading):]), x)
    obs, actions, step_type = flat(obs), flat(actions), flat(step_type)

    out, _ = self.network.apply(params, obs, step_type, ())
    if self.network_is_distribution:
      per_example = -common.log_probability(out, actions)
    else:
      labels = actions.astype(jnp.int32)
      per_example = -jnp.take_along_axis(
          jax.nn.log_softmax(out, -1), labels[..., None], -1).squeeze(-1)
    return common.aggregate_losses(per_example_loss=per_example,
                                   sample_weight=weights)

  def train(self, agent_state: BcAgentState, experience,
            weights=None) -> Tuple[BcAgentState, LossInfo]:
    loss, grads = jax.value_and_grad(self._loss)(
        agent_state.params, experience, weights)
    if self.gradient_clipping is not None:
      grads = common.clip_gradient_norms(grads, self.gradient_clipping)
    updates, opt_state = self.optimizer.update(
        grads, agent_state.opt_state, agent_state.params)
    params = optax.apply_updates(agent_state.params, updates)
    return BcAgentState(
        params=params, opt_state=opt_state,
        train_step=agent_state.train_step + 1), LossInfo(loss, ())
