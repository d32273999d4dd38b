"""Host-facing wrapper over a device policy.

Analogue of ``tf_agents/policies/py_tf_eager_policy.py:125``
(PyTFEagerPolicy): wraps a functional Policy + its params so host drivers
can call ``action(time_step, state)`` with numpy data. The jitted action
function is compiled once; per-step host<->device transfers are the only
boundary crossings (this is the SAC/MuJoCo collect path).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np

from agents_tpu.trajectories import policy_step as ps
from agents_tpu.trajectories import time_step as ts


class JittedPyPolicy:

  def __init__(self, policy, params=None, seed: int = 0,
               batch_time_steps: bool = False):
    """Args:
      policy: agents_tpu Policy.
      params: parameter pytree (update with `update_params` for staleness
        control, the ReverbVariableContainer analogue being just... a new
        pytree).
      batch_time_steps: if True, adds/strips a leading batch dim of 1
        around each call (for unbatched host envs).
    """
    self.policy = policy
    self.params = params
    self.batch_time_steps = batch_time_steps
    self._key = jax.random.key(seed)
    self._jitted = jax.jit(
        lambda p, t, s, k: policy.action(p, t, s, k))

  def update_params(self, params):
    """Pull fresh weights (the variable-container update analogue)."""
    self.params = params

  def init_state(self, batch_size=None):
    return self.policy.init_state(batch_size)

  def action(self, time_step: ts.TimeStep, state=()) -> ps.PolicyStep:
    if self.batch_time_steps:
      time_step = jax.tree_util.tree_map(
          lambda x: np.asarray(x)[None], time_step)
    self._key, sub = jax.random.split(self._key)
    step = self._jitted(self.params, time_step, state, sub)
    action = jax.tree_util.tree_map(np.asarray, step.action)
    if self.batch_time_steps:
      action = jax.tree_util.tree_map(lambda x: x[0], action)
    return ps.PolicyStep(action=action, state=step.state, info=step.info)
