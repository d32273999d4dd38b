"""Policy wrappers: greedy / epsilon-greedy / boltzmann / gaussian / OU.

Analogues of ``tf_agents/policies/greedy_policy.py``,
``epsilon_greedy_policy.py``, ``boltzmann_policy.py``,
``gaussian_policy.py``, ``ou_noise_policy.py``.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from agents_tpu import distributions as dist_lib
from agents_tpu.policies.policy import Policy
from agents_tpu.specs import array_spec
from agents_tpu.trajectories import policy_step as ps
from agents_tpu.utils import nest_utils


class GreedyPolicy(Policy):
  """Mode of the wrapped policy's distribution (greedy_policy.py:32)."""

  def __init__(self, wrapped: Policy):
    super().__init__(wrapped.time_step_spec, wrapped.action_spec,
                     info_spec=wrapped.info_spec,
                     state_spec=wrapped.state_spec,
                     emit_log_probability=wrapped.emit_log_probability,
                     clip=wrapped.clip)
    self.wrapped = wrapped

  def _action(self, params, time_step, state, key):
    dstep = self.wrapped._distribution(params, time_step, state)
    action = jax.tree_util.tree_map(
        lambda d: d.mode(), dstep.action,
        is_leaf=lambda d: hasattr(d, "mode"))
    info = dstep.info
    if self.emit_log_probability:
      # Deterministic mode: log-prob 0 (the reference wraps the mode in
      # DeterministicWithLogProb, greedy_policy.py).
      info = ps.set_log_probability(
          info, jnp.zeros(jnp.shape(time_step.step_type), jnp.float32))
    return ps.PolicyStep(action=action, state=dstep.state, info=info)

  def _distribution(self, params, time_step, state):
    dstep = self.wrapped._distribution(params, time_step, state)
    action = jax.tree_util.tree_map(
        # Preserve the wrapped distribution's event-dim reduction so
        # log_prob keeps its [B] shape (e.g. SquashedNormal event_ndims=1).
        lambda d: dist_lib.Deterministic(
            d.mode(), event_ndims=getattr(
                d, "event_ndims",
                getattr(d, "reinterpreted_batch_ndims", 0))),
        dstep.action,
        is_leaf=lambda d: hasattr(d, "mode"))
    return dstep.replace(action=action)


class EpsilonGreedyPolicy(Policy):
  """With prob epsilon act uniformly at random, else greedily
  (epsilon_greedy_policy.py:33). `epsilon` may be a float or a callable of
  the train step for decay schedules."""

  def __init__(self, wrapped: Policy, epsilon=0.1):
    super().__init__(wrapped.time_step_spec, wrapped.action_spec,
                     info_spec=wrapped.info_spec,
                     state_spec=wrapped.state_spec, clip=wrapped.clip)
    self.wrapped = wrapped
    self.epsilon = epsilon

  def _epsilon(self, params):
    if callable(self.epsilon):
      return self.epsilon(params)
    return self.epsilon

  def _action(self, params, time_step, state, key):
    k_greedy, k_rand, k_mix = jax.random.split(key, 3)
    try:
      dstep = self.wrapped._distribution(params, time_step, state)
      greedy_action = jax.tree_util.tree_map(
          lambda d: d.mode(), dstep.action,
          is_leaf=lambda d: hasattr(d, "mode"))
      out_state, out_info = dstep.state, dstep.info
    except NotImplementedError:
      # Optimization-based policies (CEMPolicy: acts by iterative refit,
      # no closed-form distribution) still compose with epsilon-greedy —
      # their _action IS the greedy arm (qtopt_agent.py collect path).
      dstep = None
      gstep = self.wrapped._action(params, time_step, state, k_greedy)
      greedy_action = gstep.action
      out_state, out_info = gstep.state, gstep.info
    batch_shape = jnp.shape(time_step.step_type)
    random_action = array_spec.sample_spec_nest(
        self.action_spec, k_rand, outer_dims=batch_shape)
    # Respect action masks if the wrapped distribution is masked.
    dist_leaves = [] if dstep is None else jax.tree_util.tree_leaves(
        dstep.action, is_leaf=lambda d: hasattr(d, "mode"))
    if len(dist_leaves) == 1 and isinstance(
        dist_leaves[0], dist_lib.MaskedCategorical):
      d = dist_leaves[0]
      uniform = dist_lib.MaskedCategorical(
          logits=jnp.zeros_like(d.logits), mask=d.mask, dtype=d.dtype)
      random_action = jax.tree_util.tree_unflatten(
          jax.tree_util.tree_structure(
              dstep.action,
              is_leaf=lambda x: hasattr(x, "mode")),
          [uniform.sample(k_rand)])
    elif len(dist_leaves) == 1 and isinstance(
        dist_leaves[0], dist_lib.ShiftedCategorical):
      # Nonzero-minimum Q policies fold any action mask into the logits
      # as NEG_INF (q_policy.py) — exploration must stay inside the mask
      # (and inside [shift, shift+K), which sample_spec_nest also gives
      # but without mask awareness).
      d = dist_leaves[0]
      valid = d.logits > dist_lib.NEG_INF / 2
      uniform = dist_lib.ShiftedCategorical(
          logits=jnp.where(valid, 0.0, dist_lib.NEG_INF), shift=d.shift,
          dtype=d.dtype)
      random_action = jax.tree_util.tree_unflatten(
          jax.tree_util.tree_structure(
              dstep.action,
              is_leaf=lambda x: hasattr(x, "mode")),
          [uniform.sample(k_rand)])
    explore = jax.random.uniform(k_mix, batch_shape) < self._epsilon(params)
    action = nest_utils.where(explore, random_action, greedy_action)
    return ps.PolicyStep(action=action, state=out_state, info=out_info)

  def _distribution(self, params, time_step, state):
    raise NotImplementedError(
        "EpsilonGreedyPolicy does not expose a distribution "
        "(matches reference behavior)")


class BoltzmannPolicy(Policy):
  """Temperature-scaled sampling from a logits policy
  (boltzmann_policy.py:28)."""

  def __init__(self, wrapped: Policy, temperature=1.0):
    super().__init__(wrapped.time_step_spec, wrapped.action_spec,
                     info_spec=wrapped.info_spec,
                     state_spec=wrapped.state_spec, clip=wrapped.clip)
    self.wrapped = wrapped
    self.temperature = temperature

  def _distribution(self, params, time_step, state):
    dstep = self.wrapped._distribution(params, time_step, state)

    def _cool(d):
      if isinstance(d, dist_lib.MaskedCategorical):
        return dist_lib.MaskedCategorical(
            logits=d.logits / self.temperature, mask=d.mask, dtype=d.dtype)
      if isinstance(d, dist_lib.ShiftedCategorical):
        # Nonzero-minimum action specs (q_policy folds the spec shift
        # into the distribution) cool the same way.
        return dist_lib.ShiftedCategorical(
            logits=d.logits / self.temperature, shift=d.shift,
            dtype=d.dtype)
      if isinstance(d, dist_lib.Categorical):
        return dist_lib.Categorical(
            logits=d.logits / self.temperature, dtype=d.dtype)
      raise ValueError("BoltzmannPolicy requires a categorical policy")

    action = jax.tree_util.tree_map(
        _cool, dstep.action, is_leaf=lambda d: hasattr(d, "mode"))
    return dstep.replace(action=action)


class GaussianPolicy(Policy):
  """Adds N(0, scale) exploration noise to the wrapped policy's action,
  clipped to spec (gaussian_policy.py:33)."""

  def __init__(self, wrapped: Policy, scale: float = 1.0):
    super().__init__(wrapped.time_step_spec, wrapped.action_spec,
                     info_spec=wrapped.info_spec,
                     state_spec=wrapped.state_spec, clip=True)
    self.wrapped = wrapped
    self.scale = scale

  def _action(self, params, time_step, state, key):
    k_inner, k_noise = jax.random.split(key)
    step = self.wrapped._action(params, time_step, state, k_inner)
    leaves, treedef = jax.tree_util.tree_flatten(step.action)
    keys = jax.random.split(k_noise, len(leaves))
    noisy = [
        a + self.scale * jax.random.normal(k, jnp.shape(a), a.dtype)
        for a, k in zip(leaves, keys)
    ]
    action = jax.tree_util.tree_unflatten(treedef, noisy)
    return step.replace(action=action)

  def _distribution(self, params, time_step, state):
    raise NotImplementedError


class OUNoisePolicy(Policy):
  """Ornstein-Uhlenbeck additive noise (ou_noise_policy.py:34); the OU
  state is carried in the policy state alongside the wrapped state."""

  def __init__(self, wrapped: Policy, ou_stddev: float = 1.0,
               ou_damping: float = 1.0):
    action_leaves = jax.tree_util.tree_leaves(
        wrapped.action_spec,
        is_leaf=lambda s: isinstance(s, array_spec.ArraySpec))
    ou_specs = tuple(
        array_spec.ArraySpec(s.shape, np.float32, "ou") for s in action_leaves)
    super().__init__(wrapped.time_step_spec, wrapped.action_spec,
                     info_spec=wrapped.info_spec,
                     state_spec=(wrapped.state_spec, ou_specs), clip=True)
    self.wrapped = wrapped
    self.ou_stddev = ou_stddev
    self.ou_damping = ou_damping

  def init_state(self, batch_size=None):
    outer = () if batch_size is None else (batch_size,)
    return (self.wrapped.init_state(batch_size),
            array_spec.zero_spec_nest(self.state_spec[1], outer_dims=outer))

  def _action(self, params, time_step, state, key):
    wrapped_state, ou_state = state
    k_inner, k_noise = jax.random.split(key)
    step = self.wrapped._action(params, time_step, wrapped_state, k_inner)
    action_leaves, treedef = jax.tree_util.tree_flatten(step.action)
    keys = jax.random.split(k_noise, len(action_leaves))
    new_ou, noisy = [], []
    for a, s, k in zip(action_leaves, ou_state, keys):
      noise = jax.random.normal(k, jnp.shape(s), jnp.float32) * self.ou_stddev
      s_new = (1.0 - self.ou_damping) * s + noise
      new_ou.append(s_new)
      noisy.append(a + s_new.astype(a.dtype))
    action = jax.tree_util.tree_unflatten(treedef, noisy)
    return ps.PolicyStep(action=action, state=(step.state, tuple(new_ou)),
                         info=step.info)

  def _distribution(self, params, time_step, state):
    raise NotImplementedError
