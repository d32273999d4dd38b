"""Random / fixed / scripted policies (test fixtures + initial collect).

Analogues of ``tf_agents/policies/random_tf_policy.py``,
``fixed_policy.py``, ``scripted_py_policy.py``.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from agents_tpu import distributions as dist_lib
from agents_tpu.policies.policy import Policy
from agents_tpu.specs import array_spec
from agents_tpu.trajectories import policy_step as ps


class RandomPolicy(Policy):
  """Uniform sampling from the action spec (random_tf_policy.py:70)."""

  def __init__(self, time_step_spec, action_spec,
               emit_log_probability: bool = False):
    super().__init__(time_step_spec, action_spec,
                     emit_log_probability=emit_log_probability, clip=False)

  def _action(self, params, time_step, state, key):
    del params
    batch_shape = jnp.shape(time_step.step_type)
    action = array_spec.sample_spec_nest(
        self.action_spec, key, outer_dims=batch_shape)
    info = ()
    if self.emit_log_probability:
      # Uniform log-prob over discrete specs (random_tf_policy.py:112).
      def _lp(s):
        n_elems = float(np.prod(s.shape)) if s.shape else 1.0
        if array_spec.is_discrete(s):
          # Joint log-prob over ALL spec elements: a (k,)-shaped
          # discrete spec is k independent uniform draws. num_values is
          # integer-bounded-only; bool is 2, unbounded ints sample from
          # [-2^28, 2^28) (sample_spec above).
          if np.dtype(s.dtype) == np.bool_:
            nv = 2.0
          elif hasattr(s, "minimum"):
            nv = float(s.num_values)
          else:
            nv = float(2 ** 29)
          return jnp.full(batch_shape, -n_elems * np.log(nv), jnp.float32)
        # Broadcast scalar bounds to the spec shape before summing —
        # scalar bounds on a (k,) spec must still contribute k terms.
        rng = np.broadcast_to(
            np.asarray(s.maximum, np.float64)
            - np.asarray(s.minimum, np.float64), s.shape or (1,))
        return jnp.full(batch_shape,
                        -float(np.sum(np.log(rng))), jnp.float32)

      lps = [
          _lp(s) for s in jax.tree_util.tree_leaves(
              self.action_spec,
              is_leaf=lambda x: isinstance(x, array_spec.ArraySpec))
      ]
      total = lps[0]
      for l in lps[1:]:
        total = total + l
      info = ps.set_log_probability((), total)
    return ps.PolicyStep(action=action, state=state, info=info)

  def _distribution(self, params, time_step, state):
    raise NotImplementedError("RandomPolicy acts by direct sampling")


class FixedPolicy(Policy):
  """Always emits the given action nest (fixed_policy.py:28)."""

  def __init__(self, action, time_step_spec, action_spec):
    super().__init__(time_step_spec, action_spec, clip=False)
    self.fixed_action = action

  def _action(self, params, time_step, state, key):
    batch_shape = jnp.shape(time_step.step_type)
    action = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(jnp.asarray(a), batch_shape + jnp.shape(
            jnp.asarray(a))), self.fixed_action)
    return ps.PolicyStep(action=action, state=state, info=())

  def _distribution(self, params, time_step, state):
    step = self._action(params, time_step, state, None)
    return step.replace(action=jax.tree_util.tree_map(
        dist_lib.Deterministic, step.action))


class ScriptedPolicy(Policy):
  """Replays a pre-recorded [T, ...] action table indexed by a step counter
  carried in the policy state (scripted_py_policy.py:32)."""

  def __init__(self, time_step_spec, action_spec, action_script):
    super().__init__(time_step_spec, action_spec,
                     state_spec=array_spec.ArraySpec((), np.int32, "t"),
                     clip=False)
    self.action_script = jax.tree_util.tree_map(jnp.asarray, action_script)
    leaves = jax.tree_util.tree_leaves(self.action_script)
    self.script_len = leaves[0].shape[0]

  def _action(self, params, time_step, state, key):
    t = state
    idx = jnp.minimum(t, self.script_len - 1)
    action = jax.tree_util.tree_map(lambda s: s[idx], self.action_script)
    return ps.PolicyStep(action=action, state=t + 1, info=())

  def _distribution(self, params, time_step, state):
    raise NotImplementedError
