"""Q-network policies: greedy-over-Q and C51 variants.

Analogues of ``tf_agents/policies/q_policy.py`` and
``categorical_q_policy.py``. Support the reference's
``observation_and_action_constraint_splitter`` action masking
(dqn_agent.py:141): the splitter maps observation -> (network_obs, mask).
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from agents_tpu import distributions as dist_lib
from agents_tpu.policies.policy import Policy
from agents_tpu.trajectories import policy_step as ps


class QPolicy(Policy):
  """Argmax-over-Q as a (masked) greedy Categorical distribution."""

  def __init__(self, time_step_spec, action_spec, q_network,
               observation_and_action_constraint_splitter=None,
               emit_log_probability: bool = False):
    super().__init__(time_step_spec, action_spec,
                     state_spec=q_network.state_spec,
                     emit_log_probability=emit_log_probability, clip=False)
    self.q_network = q_network
    self.splitter = observation_and_action_constraint_splitter
    leaves = jax.tree_util.tree_leaves(
        action_spec, is_leaf=lambda s: hasattr(s, "dtype"))
    self._action_dtype = leaves[0].dtype
    self._action_minimum = getattr(leaves[0], "minimum", 0)

  def q_values(self, params, time_step, state=()):
    obs = time_step.observation
    mask = None
    if self.splitter is not None:
      obs, mask = self.splitter(obs)
    q, new_state = self.q_network.apply(
        params, obs, time_step.step_type, state)
    return q, mask, new_state

  def _distribution(self, params, time_step, state):
    q, mask, new_state = self.q_values(params, time_step, state)
    shift = int(np.asarray(self._action_minimum))
    if shift != 0:
      # Nonzero spec minimum: fold any mask into the logits and emit the
      # shifted distribution (reference q_policy.py:182-189) so sampled
      # actions live in [min, min+K) like the spec promises.
      if mask is not None:
        q = jnp.where(mask, q, dist_lib.NEG_INF)
      dist = dist_lib.ShiftedCategorical(
          logits=q, shift=shift, dtype=jnp.dtype(self._action_dtype))
    elif mask is not None:
      dist = dist_lib.MaskedCategorical(
          logits=q, mask=mask, dtype=jnp.dtype(self._action_dtype))
    else:
      dist = dist_lib.Categorical(logits=q, dtype=jnp.dtype(self._action_dtype))
    return ps.PolicyStep(action=dist, state=new_state, info=())


class CategoricalQPolicy(QPolicy):
  """C51: expectation over atom support then argmax
  (categorical_q_policy.py:39)."""

  def __init__(self, time_step_spec, action_spec, q_network, min_q_value,
               max_q_value, observation_and_action_constraint_splitter=None,
               emit_log_probability: bool = False):
    super().__init__(time_step_spec, action_spec, q_network,
                     observation_and_action_constraint_splitter,
                     emit_log_probability)
    self.min_q_value = float(min_q_value)
    self.max_q_value = float(max_q_value)
    self.num_atoms = q_network.num_atoms

  @property
  def support(self):
    return jnp.linspace(self.min_q_value, self.max_q_value, self.num_atoms)

  def q_values(self, params, time_step, state=()):
    obs = time_step.observation
    mask = None
    if self.splitter is not None:
      obs, mask = self.splitter(obs)
    logits, new_state = self.q_network.apply(
        params, obs, time_step.step_type, state)  # [B, A, atoms]
    probs = jax.nn.softmax(logits, axis=-1)
    q = jnp.sum(probs * self.support, axis=-1)  # [B, A]
    return q, mask, new_state
