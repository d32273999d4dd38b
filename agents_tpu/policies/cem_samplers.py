"""CEM action samplers: continuous, hybrid, and one-hot+continuous.

Analogues of ``tf_agents/policies/samplers/``:
  - ActionsSampler base (qtopt_cem_actions_sampler.py:30 —
    sample_batch_and_clip :71, refit_distribution_to :56)
  - GaussianActionsSampler, continuous (…_continuous.py)
  - hybrid continuous+discrete (…_hybrid.py:30)
  - continuous + one-hot categorical (…_continuous_and_one_hot.py:130)

Samplers operate on nested action specs: distribution params are a
per-leaf (mean, var) pytree; samples are [N, B, ...leaf] pytrees. All
candidates are materialized at once so the CEM policy can evaluate them
in a single batched critic call (vs the reference's per-sample map_fn).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from agents_tpu.specs import array_spec


def _leaves(action_spec):
  return jax.tree_util.tree_leaves(
      action_spec, is_leaf=lambda s: isinstance(s, array_spec.ArraySpec))


def _treedef(action_spec):
  return jax.tree_util.tree_structure(
      action_spec, is_leaf=lambda s: isinstance(s, array_spec.ArraySpec))


def _gather_elites(samples, elite_idx, spec_shape):
  """samples [N, B, ...], elite_idx [B, E] -> [B, E, ...]."""
  samples_bt = jnp.moveaxis(samples, 0, 1)  # [B, N, ...]
  idx = elite_idx.reshape(elite_idx.shape + (1,) * len(spec_shape))
  return jnp.take_along_axis(samples_bt, idx, axis=1)


class ActionsSampler:
  """Base: distribution params pytree + sample/refit over elites
  (reference qtopt_cem_actions_sampler.py:30)."""

  def __init__(self, action_spec, sample_clippers: Sequence[Callable] = ()):
    self.action_spec = action_spec
    self.specs = _leaves(action_spec)
    self.treedef = _treedef(action_spec)
    self.sample_clippers = tuple(sample_clippers)

  def unflatten(self, leaves):
    return jax.tree_util.tree_unflatten(self.treedef, leaves)

  def init(self, batch_size: int, initial_std: float = 0.33):
    raise NotImplementedError

  def sample_batch_and_clip(self, key, num_samples, dist_params):
    raise NotImplementedError

  def refit_distribution_to(self, elite_idx, samples):
    raise NotImplementedError

  def mode(self, dist_params):
    """Best single action per batch element from the fitted params."""
    raise NotImplementedError

  def _apply_clippers(self, actions):
    for clipper in self.sample_clippers:
      actions = clipper(actions)
    return actions


class GaussianContinuousSampler(ActionsSampler):
  """Truncated-by-clipping Gaussian over bounded continuous leaves
  (reference qtopt_cem_actions_sampler_continuous.py)."""

  def __init__(self, action_spec, sample_clippers=()):
    super().__init__(action_spec, sample_clippers)
    for s in self.specs:
      if not array_spec.is_continuous(s):
        raise ValueError("continuous sampler requires continuous leaves")

  def init(self, batch_size, initial_std=0.33):
    means, variances = [], []
    for s in self.specs:
      lo = jnp.asarray(s.minimum, jnp.float32)
      hi = jnp.asarray(s.maximum, jnp.float32)
      mean = jnp.broadcast_to((lo + hi) / 2.0, (batch_size,) + s.shape)
      std = jnp.broadcast_to((hi - lo) * initial_std,
                             (batch_size,) + s.shape)
      means.append(mean)
      variances.append(std**2)
    return tuple(means), tuple(variances)

  def sample_batch_and_clip(self, key, num_samples, dist_params):
    means, variances = dist_params
    keys = jax.random.split(key, len(self.specs))
    out = []
    for s, mean, var, k in zip(self.specs, means, variances, keys):
      eps = jax.random.normal(k, (num_samples,) + mean.shape)
      samples = mean[None] + jnp.sqrt(var)[None] * eps
      samples = jnp.clip(samples, jnp.asarray(s.minimum, jnp.float32),
                         jnp.asarray(s.maximum, jnp.float32))
      out.append(samples)
    return self._apply_clippers(tuple(out))

  def refit_distribution_to(self, elite_idx, samples):
    means, variances = [], []
    for s, leaf in zip(self.specs, samples):
      elites = _gather_elites(leaf, elite_idx, s.shape)   # [B, E, ...]
      means.append(jnp.mean(elites, axis=1))
      variances.append(jnp.var(elites, axis=1) + 1e-6)
    return tuple(means), tuple(variances)

  def mode(self, dist_params):
    means, _ = dist_params
    return tuple(
        jnp.clip(m, jnp.asarray(s.minimum, jnp.float32),
                 jnp.asarray(s.maximum, jnp.float32))
        for s, m in zip(self.specs, means))


class GaussianHybridSampler(GaussianContinuousSampler):
  """Continuous + discrete leaves: discrete dims are sampled from the same
  Gaussian then rounded and cast back to the spec dtype (reference
  qtopt_cem_actions_sampler_hybrid.py:30)."""

  def __init__(self, action_spec, sample_clippers=()):
    ActionsSampler.__init__(self, action_spec, sample_clippers)

  def sample_batch_and_clip(self, key, num_samples, dist_params):
    means, variances = dist_params
    keys = jax.random.split(key, len(self.specs))
    out = []
    for s, mean, var, k in zip(self.specs, means, variances, keys):
      eps = jax.random.normal(k, (num_samples,) + mean.shape)
      samples = mean[None] + jnp.sqrt(var)[None] * eps
      samples = jnp.clip(samples, jnp.asarray(s.minimum, jnp.float32),
                         jnp.asarray(s.maximum, jnp.float32))
      if array_spec.is_discrete(s):
        samples = jnp.round(samples)
      out.append(samples)
    return self._apply_clippers(tuple(out))

  def mode(self, dist_params):
    means, _ = dist_params
    out = []
    for s, m in zip(self.specs, means):
      m = jnp.clip(m, jnp.asarray(s.minimum, jnp.float32),
                   jnp.asarray(s.maximum, jnp.float32))
      if array_spec.is_discrete(s):
        m = jnp.round(m).astype(s.dtype)
      out.append(m)
    return tuple(out)

  def to_spec_dtypes(self, samples):
    return tuple(
        leaf.astype(s.dtype) if array_spec.is_discrete(s) else leaf
        for s, leaf in zip(self.specs, samples))


class GaussianOneHotSampler(ActionsSampler):
  """Continuous leaves: Gaussian. One-hot leaves (rank-1, 0/1 bounds):
  the 'mean' is a probability vector; sampling draws a categorical and
  one-hot encodes it; refit averages the elite one-hots (reference
  qtopt_cem_actions_sampler_continuous_and_one_hot.py:130)."""

  @staticmethod
  def _is_one_hot(spec) -> bool:
    return (array_spec.is_discrete(spec) and len(spec.shape) == 1
            and int(np.max(spec.maximum)) == 1)

  def __init__(self, action_spec, sample_clippers=()):
    super().__init__(action_spec, sample_clippers)
    for s in self.specs:
      if array_spec.is_discrete(s) and not self._is_one_hot(s):
        # A non-one-hot discrete leaf would silently fall into the
        # Gaussian branch and emit fractional actions for an integer
        # spec; integer-index leaves belong to GaussianHybridSampler
        # (which rounds and casts).
        raise ValueError(
            f"GaussianOneHotSampler handles one-hot discrete leaves "
            f"(rank-1, 0/1 bounds); got discrete spec {s}. Use "
            "GaussianHybridSampler for integer-index action leaves.")

  def init(self, batch_size, initial_std=0.33):
    means, variances = [], []
    for s in self.specs:
      if self._is_one_hot(s):
        k = s.shape[0]
        means.append(jnp.full((batch_size, k), 1.0 / k))
        variances.append(jnp.zeros((batch_size, k)))
      else:
        lo = jnp.asarray(s.minimum, jnp.float32)
        hi = jnp.asarray(s.maximum, jnp.float32)
        means.append(
            jnp.broadcast_to((lo + hi) / 2.0, (batch_size,) + s.shape))
        variances.append(
            jnp.broadcast_to(((hi - lo) * initial_std)**2,
                             (batch_size,) + s.shape))
    return tuple(means), tuple(variances)

  def sample_batch_and_clip(self, key, num_samples, dist_params):
    means, variances = dist_params
    keys = jax.random.split(key, len(self.specs))
    out = []
    for s, mean, var, k in zip(self.specs, means, variances, keys):
      if self._is_one_hot(s):
        logits = jnp.log(jnp.maximum(mean, 1e-9))          # [B, K]
        idx = jax.random.categorical(
            k, jnp.broadcast_to(logits, (num_samples,) + logits.shape))
        out.append(jax.nn.one_hot(idx, s.shape[0]))        # [N, B, K]
      else:
        eps = jax.random.normal(k, (num_samples,) + mean.shape)
        samples = mean[None] + jnp.sqrt(var)[None] * eps
        out.append(
            jnp.clip(samples, jnp.asarray(s.minimum, jnp.float32),
                     jnp.asarray(s.maximum, jnp.float32)))
    return self._apply_clippers(tuple(out))

  def refit_distribution_to(self, elite_idx, samples):
    means, variances = [], []
    for s, leaf in zip(self.specs, samples):
      elites = _gather_elites(leaf, elite_idx, s.shape)
      if self._is_one_hot(s):
        probs = jnp.mean(elites, axis=1) + 1e-6
        means.append(probs / jnp.sum(probs, axis=-1, keepdims=True))
        variances.append(jnp.zeros_like(probs))
      else:
        means.append(jnp.mean(elites, axis=1))
        variances.append(jnp.var(elites, axis=1) + 1e-6)
    return tuple(means), tuple(variances)

  def mode(self, dist_params):
    means, _ = dist_params
    out = []
    for s, m in zip(self.specs, means):
      if self._is_one_hot(s):
        out.append(jax.nn.one_hot(jnp.argmax(m, -1),
                                  s.shape[0]).astype(s.dtype))
      else:
        out.append(jnp.clip(m, jnp.asarray(s.minimum, jnp.float32),
                            jnp.asarray(s.maximum, jnp.float32)))
    return tuple(out)
