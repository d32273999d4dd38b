"""Projection heads emitting distributions.

Analogues of ``tf_agents/networks/normal_projection_network.py``,
``categorical_projection_network.py`` and SAC's
``tanh_normal_projection_network.py:143``. Each head maps encoder features
to a distribution over one action-spec leaf.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from agents_tpu import distributions as dist_lib
from agents_tpu.networks.network import _uniform_symmetric
from agents_tpu.specs import array_spec


class CategoricalProjection(nn.Module):
  """Logits head -> Categorical (categorical_projection_network.py:33).

  ``event_shape`` preserves the spec's event dims: a (1,)-shaped discrete
  spec must sample [B, 1], not [B] (the reference reshapes logits to
  batch + spec.shape + [K])."""
  num_actions: int
  logits_init_scale: float = 0.1
  dtype: Any = jnp.float32
  event_shape: tuple = ()

  @nn.compact
  def __call__(self, features):
    n = int(np.prod(self.event_shape)) if self.event_shape else 1
    logits = nn.Dense(
        n * self.num_actions,
        kernel_init=_uniform_symmetric(self.logits_init_scale),
        bias_init=nn.initializers.zeros, dtype=self.dtype)(features)
    logits = logits.reshape(logits.shape[:-1] + tuple(self.event_shape)
                            + (self.num_actions,))
    dist = dist_lib.Categorical(logits.astype(jnp.float32))
    if self.event_shape:
      # Reduce the event dims in log_prob/entropy: without this, a
      # (1,)-shaped discrete spec emits [B, 1] log-probs that broadcast
      # against other leaves into [B, B] garbage (the distributions
      # contract is one value per batch element, distributions.py:14).
      dist = dist_lib.Independent(
          dist, reinterpreted_batch_ndims=len(self.event_shape))
    return dist


class NormalProjection(nn.Module):
  """Mean/std head -> Normal squashed into spec bounds via mean-scaling
  (normal_projection_network.py:61). `state_dependent_std=False` matches
  the reference default (single bias-like std param).
  """
  sample_spec: Any  # BoundedArraySpec, static
  state_dependent_std: bool = False
  init_means_output_factor: float = 0.1
  std_bias_initializer_value: float = 0.0
  scale_distribution: bool = False  # if True, tanh-squash (SquashedNormal)
  min_std: float = 1e-3
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, features):
    spec = self.sample_spec
    size = int(np.prod(spec.shape))
    means = nn.Dense(
        size, kernel_init=_uniform_symmetric(self.init_means_output_factor),
        dtype=self.dtype)(features)
    if self.state_dependent_std:
      stds_in = nn.Dense(
          size,
          kernel_init=_uniform_symmetric(self.init_means_output_factor),
          bias_init=nn.initializers.constant(
              self.std_bias_initializer_value),
          dtype=self.dtype)(features)
    else:
      bias = self.param("std_bias", nn.initializers.constant(
          self.std_bias_initializer_value), (size,), self.dtype)
      stds_in = jnp.broadcast_to(bias, means.shape)
    means = means.reshape(means.shape[:-1] + spec.shape).astype(jnp.float32)
    stds_in = stds_in.reshape(
        stds_in.shape[:-1] + spec.shape).astype(jnp.float32)
    std = jax.nn.softplus(stds_in) + self.min_std

    low = jnp.asarray(spec.minimum, jnp.float32)
    high = jnp.asarray(spec.maximum, jnp.float32)
    if self.scale_distribution:
      return dist_lib.SquashedNormal(
          loc=means, scale=std, low=low, high=high,
          event_ndims=len(spec.shape))
    # Mean squashed into bounds with tanh, std free (reference default
    # `mean_transform=tanh_squash_to_spec`).
    mean = low + (high - low) / 2.0 * (jnp.tanh(means) + 1.0)
    return dist_lib.Independent(
        dist_lib.Normal(mean, std),
        reinterpreted_batch_ndims=len(spec.shape))


class TanhNormalProjection(nn.Module):
  """SAC head: state-dependent log-std, tanh-squashed distribution
  (sac/tanh_normal_projection_network.py:143). log-std clamped to
  [-20, 2] as in the reference/Haarnoja."""
  sample_spec: Any
  dtype: Any = jnp.float32
  log_std_min: float = -20.0
  log_std_max: float = 2.0

  @nn.compact
  def __call__(self, features):
    spec = self.sample_spec
    size = int(np.prod(spec.shape))
    out = nn.Dense(2 * size, dtype=self.dtype)(features)
    means, log_stds = jnp.split(out, 2, axis=-1)
    means = means.reshape(means.shape[:-1] + spec.shape).astype(jnp.float32)
    log_stds = log_stds.reshape(
        log_stds.shape[:-1] + spec.shape).astype(jnp.float32)
    log_stds = jnp.clip(log_stds, self.log_std_min, self.log_std_max)
    return dist_lib.SquashedNormal(
        loc=means, scale=jnp.exp(log_stds),
        low=jnp.asarray(spec.minimum, jnp.float32),
        high=jnp.asarray(spec.maximum, jnp.float32),
        event_ndims=len(spec.shape))


def default_projection(sample_spec, continuous_projection=NormalProjection):
  """Pick a projection module for one action-spec leaf
  (actor_distribution_network.py:49 `_categorical_projection_net` /
  `_normal_projection_net`)."""
  if array_spec.is_discrete(sample_spec):
    if sample_spec.shape not in ((), (1,)):
      raise ValueError(
          f"Discrete projection requires scalar action spec, got {sample_spec}")
    return CategoricalProjection(num_actions=sample_spec.num_values,
                                 event_shape=tuple(sample_spec.shape))
  return continuous_projection(sample_spec=sample_spec)
