"""Policy base: pure functions over (params, time_step, state, key).

TPU-native analogue of ``tf_agents/policies/tf_policy.py:42``. Differences
by design: parameters are an explicit argument (so target/behavior copies
are just different pytrees), randomness is an explicit key, and both
`action` and `distribution` are trace-safe.

Reference-parity behaviors kept here:
  - automatic state reset on FIRST steps (tf_policy.py:257)
  - action clipping to bounded specs (tf_policy.py:335)
  - emit_log_probability info (tf_policy.py:478)
"""
from __future__ import annotations

import abc
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from agents_tpu.specs import array_spec
from agents_tpu.trajectories import policy_step as ps
from agents_tpu.trajectories import time_step as ts
from agents_tpu.utils import nest_utils


def clip_to_spec(action, spec):
  """Clip continuous actions into bounded specs (tf_policy.py:335)."""

  def _clip(a, s):
    if isinstance(s, array_spec.BoundedArraySpec) and array_spec.is_continuous(s):
      return jnp.clip(a, jnp.asarray(s.minimum, a.dtype),
                      jnp.asarray(s.maximum, a.dtype))
    return a

  leaves, treedef = jax.tree_util.tree_flatten(action)
  spec_leaves = jax.tree_util.tree_leaves(
      spec, is_leaf=lambda x: isinstance(x, array_spec.ArraySpec))
  return jax.tree_util.tree_unflatten(
      treedef, [_clip(a, s) for a, s in zip(leaves, spec_leaves)])


class Policy(abc.ABC):
  """Base policy.

  Attributes:
    time_step_spec / action_spec / info_spec / state_spec: spec nests.
    emit_log_probability: if True, `action` writes log-probs into info.
  """

  def __init__(self, time_step_spec, action_spec, info_spec=(),
               state_spec=(), emit_log_probability: bool = False,
               clip: bool = True):
    self.time_step_spec = time_step_spec
    self.action_spec = action_spec
    self.info_spec = info_spec
    self.state_spec = state_spec
    self.emit_log_probability = emit_log_probability
    self.clip = clip

  # -- state ---------------------------------------------------------------
  def init_state(self, batch_size: Optional[int] = None):
    outer = () if batch_size is None else (batch_size,)
    return array_spec.zero_spec_nest(self.state_spec, outer_dims=outer)

  def _maybe_auto_reset(self, time_step: ts.TimeStep, state):
    """Zero the state rows whose time step is FIRST (tf_policy.py:257)."""
    if state is None or (isinstance(state, tuple) and state == ()):
      return state
    is_first = time_step.is_first()
    zero = jax.tree_util.tree_map(jnp.zeros_like, state)
    return nest_utils.where(is_first, zero, state)

  # -- public API ----------------------------------------------------------
  def action(self, params, time_step: ts.TimeStep, state=(),
             key: Optional[jax.Array] = None) -> ps.PolicyStep:
    state = self._maybe_auto_reset(time_step, state)
    step = self._action(params, time_step, state, key)
    if self.clip:
      step = step.replace(action=clip_to_spec(step.action, self.action_spec))
    return step

  def distribution(self, params, time_step: ts.TimeStep,
                   state=()) -> ps.PolicyStep:
    state = self._maybe_auto_reset(time_step, state)
    return self._distribution(params, time_step, state)

  # -- implementations -----------------------------------------------------
  def _action(self, params, time_step, state, key) -> ps.PolicyStep:
    """Default: sample from `_distribution` (subclasses may override)."""
    dstep = self._distribution(params, time_step, state)
    dist_nest = dstep.action
    leaves, treedef = jax.tree_util.tree_flatten(
        dist_nest, is_leaf=lambda d: hasattr(d, "sample"))
    keys = jax.random.split(key, len(leaves))
    actions = [d.sample(k) for d, k in zip(leaves, keys)]
    action = jax.tree_util.tree_unflatten(treedef, actions)
    info = dstep.info
    if self.emit_log_probability:
      lps = [d.log_prob(a) for d, a in zip(leaves, actions)]
      total = lps[0]
      for l in lps[1:]:
        total = total + l
      info = ps.set_log_probability(info, total)
    return ps.PolicyStep(action=action, state=dstep.state, info=info)

  @abc.abstractmethod
  def _distribution(self, params, time_step, state) -> ps.PolicyStep:
    ...
