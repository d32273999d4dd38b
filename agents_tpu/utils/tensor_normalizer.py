"""Streaming and EMA observation/reward normalizers (PPO).

Analogue of ``tf_agents/utils/tensor_normalizer.py``: `EMATensorNormalizer`
(:208) and `StreamingTensorNormalizer` (:288), reworked as pure pytree
state + update/normalize functions. The streaming variant keeps
count/mean-sum/variance-sum like the reference (whose update is a
parallel-variance accumulation, :397).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from agents_tpu.specs import array_spec


@struct.dataclass
class StreamingNormalizerState:
  count: Any      # per-leaf [inner...] float32
  mean_sum: Any   # per-leaf sum of values
  var_sum: Any    # per-leaf sum of squared deviations from running mean


class StreamingTensorNormalizer:
  """Aggregates counts/sums exactly like the reference (:288-395):
  normalization uses mean = mean_sum/count, var = var_sum/count."""

  def __init__(self, spec, epsilon: float = 1e-8):
    self.spec = spec
    self.epsilon = epsilon

  def init(self) -> StreamingNormalizerState:
    zeros = lambda: array_spec.map_spec_nest(
        lambda s: jnp.full(s.shape, 1e-8, jnp.float32), self.spec)
    return StreamingNormalizerState(
        count=zeros(), mean_sum=jax.tree_util.tree_map(
            jnp.zeros_like, zeros()),
        var_sum=jax.tree_util.tree_map(jnp.zeros_like, zeros()))

  def update(self, state: StreamingNormalizerState,
             values, outer_dims=None) -> StreamingNormalizerState:
    """values leaves are [B..., inner...]; reduce over outer dims."""

    def _upd(count, mean_sum, var_sum, x):
      inner_rank = mean_sum.ndim
      axes = tuple(range(x.ndim - inner_rank))
      n = np.prod([x.shape[a] for a in axes]) if axes else 1
      x = x.astype(jnp.float32)
      # Chan's exact parallel-variance combine (reference
      # parallel_variance_calculation, tensor_normalizer.py:397):
      # accumulating sum((x - old_running_mean)^2) instead would measure
      # the FIRST batch's deviations from zero (the empty-state mean),
      # inflating the early std estimate by ~|mean|/std x.
      batch_mean = jnp.mean(x, axis=axes)
      batch_m2 = jnp.sum(jnp.square(x - batch_mean), axis=axes)
      old_mean = mean_sum / jnp.maximum(count, 1e-8)
      new_count = count + n
      delta = batch_mean - old_mean
      new_var_sum = (var_sum + batch_m2
                     + jnp.square(delta) * count * n / new_count)
      new_mean_sum = mean_sum + jnp.sum(x, axis=axes)
      return new_count, new_mean_sum, new_var_sum

    flat_c = jax.tree_util.tree_leaves(state.count)
    flat_m = jax.tree_util.tree_leaves(state.mean_sum)
    flat_v = jax.tree_util.tree_leaves(state.var_sum)
    leaves, treedef = jax.tree_util.tree_flatten(values)
    outs = [_upd(c, m, v, x)
            for c, m, v, x in zip(flat_c, flat_m, flat_v, leaves)]
    unf = lambda i: jax.tree_util.tree_unflatten(
        treedef, [o[i] for o in outs])
    return StreamingNormalizerState(count=unf(0), mean_sum=unf(1),
                                    var_sum=unf(2))

  def normalize(self, state: StreamingNormalizerState, values,
                clip_value: float = 5.0, center_mean: bool = True):
    def _norm(count, mean_sum, var_sum, x):
      mean = mean_sum / jnp.maximum(count, 1e-8)
      var = var_sum / jnp.maximum(count, 1e-8)
      std = jnp.sqrt(jnp.maximum(var, 0.0)) + self.epsilon
      out = (x.astype(jnp.float32) - (mean if center_mean else 0.0)) / std
      if clip_value > 0:
        out = jnp.clip(out, -clip_value, clip_value)
      return out

    flat_c = jax.tree_util.tree_leaves(state.count)
    flat_m = jax.tree_util.tree_leaves(state.mean_sum)
    flat_v = jax.tree_util.tree_leaves(state.var_sum)
    leaves, treedef = jax.tree_util.tree_flatten(values)
    return jax.tree_util.tree_unflatten(
        treedef,
        [_norm(c, m, v, x)
         for c, m, v, x in zip(flat_c, flat_m, flat_v, leaves)])


@struct.dataclass
class EMANormalizerState:
  mean: Any
  var: Any


class EMATensorNormalizer:
  """Exponential-moving-average normalizer (reference :208)."""

  def __init__(self, spec, norm_update_rate: float = 0.001,
               epsilon: float = 1e-8):
    self.spec = spec
    self.rate = norm_update_rate
    self.epsilon = epsilon

  def init(self) -> EMANormalizerState:
    return EMANormalizerState(
        mean=array_spec.map_spec_nest(
            lambda s: jnp.zeros(s.shape, jnp.float32), self.spec),
        var=array_spec.map_spec_nest(
            lambda s: jnp.ones(s.shape, jnp.float32), self.spec))

  def update(self, state: EMANormalizerState, values) -> EMANormalizerState:
    def _upd(mean, var, x):
      inner_rank = mean.ndim
      axes = tuple(range(x.ndim - inner_rank))
      x = x.astype(jnp.float32)
      batch_mean = jnp.mean(x, axis=axes)
      # Variance around the MOVING-AVERAGE mean (reference
      # tensor_normalizer.py:258-263 "so that this works even with batch
      # size 1"): around the batch mean, a batch of 1 gives var 0 every
      # update and the var EMA decays to ~0, exploding normalize().
      batch_var = jnp.mean(jnp.square(x - mean), axis=axes)
      new_mean = mean + self.rate * (batch_mean - mean)
      new_var = var + self.rate * (batch_var - var)
      return new_mean, new_var

    flat_m = jax.tree_util.tree_leaves(state.mean)
    flat_v = jax.tree_util.tree_leaves(state.var)
    leaves, treedef = jax.tree_util.tree_flatten(values)
    outs = [_upd(m, v, x) for m, v, x in zip(flat_m, flat_v, leaves)]
    return EMANormalizerState(
        mean=jax.tree_util.tree_unflatten(treedef, [o[0] for o in outs]),
        var=jax.tree_util.tree_unflatten(treedef, [o[1] for o in outs]))

  def normalize(self, state: EMANormalizerState, values,
                clip_value: float = 5.0, center_mean: bool = True):
    def _norm(mean, var, x):
      std = jnp.sqrt(jnp.maximum(var, 0.0)) + self.epsilon
      out = (x.astype(jnp.float32) - (mean if center_mean else 0.0)) / std
      if clip_value > 0:
        out = jnp.clip(out, -clip_value, clip_value)
      return out

    flat_m = jax.tree_util.tree_leaves(state.mean)
    flat_v = jax.tree_util.tree_leaves(state.var)
    leaves, treedef = jax.tree_util.tree_flatten(values)
    return jax.tree_util.tree_unflatten(
        treedef,
        [_norm(m, v, x) for m, v, x in zip(flat_m, flat_v, leaves)])
