"""PPO collect policy: emits the action distribution and value prediction
in policy_info.

Analogue of ``tf_agents/agents/ppo/ppo_policy.py:310``. TPU-native twist:
because distributions here are pytree dataclasses, the info field carries
the *distribution object itself* (its parameter arrays flow through
replay/scan like any other leaf) — no separate DistributionSpecV2
machinery (reference distributions/utils.py:571) is needed to reconstruct
old policies for the KL/ratio terms.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from agents_tpu.policies.policy import Policy
from agents_tpu.trajectories import policy_step as ps


class PPOPolicy(Policy):
  """info = {'dist': <distribution pytree>, 'value_prediction': [B]}."""

  def __init__(self, time_step_spec, action_spec, actor_network,
               value_network, observation_normalizer=None, clip: bool = True):
    super().__init__(time_step_spec, action_spec,
                     state_spec=(actor_network.state_spec,
                                 value_network.state_spec),
                     clip=clip)
    self.actor_network = actor_network
    self.value_network = value_network
    self.observation_normalizer = observation_normalizer

  def _nets(self, params, time_step, state):
    obs = time_step.observation
    if self.observation_normalizer is not None:
      obs = self.observation_normalizer.normalize(
          params["normalizer"], obs)
    actor_state, value_state = state if isinstance(state, tuple) and len(
        state) == 2 else ((), ())
    dist, new_actor_state = self.actor_network.apply(
        params["actor"], obs, time_step.step_type, actor_state)
    value, new_value_state = self.value_network.apply(
        params["value"], obs, time_step.step_type, value_state)
    return dist, value, (new_actor_state, new_value_state)

  def _action(self, params, time_step, state, key):
    dist, value, new_state = self._nets(params, time_step, state)
    leaves, treedef = jax.tree_util.tree_flatten(
        dist, is_leaf=lambda d: hasattr(d, "sample"))
    keys = jax.random.split(key, len(leaves))
    actions = jax.tree_util.tree_unflatten(
        treedef, [d.sample(k) for d, k in zip(leaves, keys)])
    info = {"dist": dist, "value_prediction": value}
    return ps.PolicyStep(action=actions, state=new_state, info=info)

  def _distribution(self, params, time_step, state):
    dist, value, new_state = self._nets(params, time_step, state)
    return ps.PolicyStep(action=dist, state=new_state,
                         info={"dist": dist, "value_prediction": value})
