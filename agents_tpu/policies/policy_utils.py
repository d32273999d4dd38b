"""Policy utilities.

Analogues of ``tf_agents/policies/async_policy_saver.py`` (background
thread export), ``policy_info_updater_wrapper.py`` (info-field injection)
and ``temporal_action_smoothing.py`` (action EMA smoothing).
"""
from __future__ import annotations

import threading
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from agents_tpu.policies.policy import Policy
from agents_tpu.specs import array_spec
from agents_tpu.trajectories import policy_step as ps


class AsyncPolicySaver:
  """Runs PolicySaver.save on a background thread (async_policy_saver.py).
  Only one save in flight; subsequent requests are coalesced."""

  def __init__(self, saver):
    self._saver = saver
    self._thread: Optional[threading.Thread] = None
    self._lock = threading.Lock()

  def save(self, export_dir: str, params):
    with self._lock:
      if self._thread is not None and self._thread.is_alive():
        return False
      params = jax.tree_util.tree_map(np.asarray, params)  # snapshot
      self._thread = threading.Thread(
          target=self._saver.save, args=(export_dir, params), daemon=True)
      self._thread.start()
      return True

  def flush(self):
    t = self._thread
    if t is not None:
      t.join()


class PolicyInfoUpdaterWrapper(Policy):
  """Injects computed fields into policy_info
  (policy_info_updater_wrapper.py). `updater_fn(policy_step) -> dict` of
  extra info entries."""

  def __init__(self, wrapped: Policy, updater_fn: Callable):
    super().__init__(wrapped.time_step_spec, wrapped.action_spec,
                     info_spec=wrapped.info_spec,
                     state_spec=wrapped.state_spec, clip=wrapped.clip)
    self.wrapped = wrapped
    self.updater_fn = updater_fn

  def _merge(self, step):
    extra = self.updater_fn(step)
    info = step.info
    if info == () or info is None:
      info = {}
    if isinstance(info, dict):
      info = {**info, **extra}
    else:
      raise TypeError("PolicyInfoUpdaterWrapper requires dict info")
    return step.replace(info=info)

  def _action(self, params, time_step, state, key):
    return self._merge(self.wrapped._action(params, time_step, state, key))

  def _distribution(self, params, time_step, state):
    return self._merge(self.wrapped._distribution(params, time_step, state))


class TemporalActionSmoothingPolicy(Policy):
  """EMA smoothing over successive actions
  (temporal_action_smoothing.py): a_out = c * prev + (1-c) * a. The
  moving average lives in the policy state."""

  def __init__(self, wrapped: Policy, smoothing_coefficient: float):
    action_leaves = jax.tree_util.tree_leaves(
        wrapped.action_spec,
        is_leaf=lambda s: isinstance(s, array_spec.ArraySpec))
    ema_specs = tuple(
        array_spec.ArraySpec(s.shape, np.float32, "ema")
        for s in action_leaves)
    super().__init__(wrapped.time_step_spec, wrapped.action_spec,
                     state_spec=(wrapped.state_spec, ema_specs),
                     clip=wrapped.clip)
    self.wrapped = wrapped
    self.c = smoothing_coefficient

  def init_state(self, batch_size=None):
    outer = () if batch_size is None else (batch_size,)
    return (self.wrapped.init_state(batch_size),
            array_spec.zero_spec_nest(self.state_spec[1], outer_dims=outer))

  def _action(self, params, time_step, state, key):
    wrapped_state, ema = state
    step = self.wrapped._action(params, time_step, wrapped_state, key)
    leaves, treedef = jax.tree_util.tree_flatten(step.action)
    smoothed, new_ema = [], []
    for a, m in zip(leaves, ema):
      out = self.c * m + (1.0 - self.c) * a.astype(jnp.float32)
      smoothed.append(out.astype(a.dtype))
      new_ema.append(out)
    return ps.PolicyStep(
        action=jax.tree_util.tree_unflatten(treedef, smoothed),
        state=(step.state, tuple(new_ema)), info=step.info)

  def _distribution(self, params, time_step, state):
    raise NotImplementedError
