"""Spec-driven encoder: preprocessing -> combiner -> conv -> MLP.

Analogue of ``tf_agents/networks/encoding_network.py:83``. Handles nested
observations via per-leaf preprocessing modules and a concat combiner, then
optional conv stack and fully-connected stack. All matmuls hit the MXU;
keep `fc_layer_params` multiples of 128 where throughput matters.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from agents_tpu.networks.network import Network, variance_scaling
from agents_tpu.specs import array_spec
from agents_tpu.networks.registry import register_factory


class EncoderModule(nn.Module):
  """conv_layer_params: sequence of (filters, kernel_size, stride).
  fc_layer_params: sequence of layer widths.
  preprocessing_combiner: callable merging the flattened obs leaves
  (default: concat along the last axis after flattening inner dims).
  """
  conv_layer_params: Sequence[Tuple[int, int, int]] = ()
  fc_layer_params: Sequence[int] = (64, 64)
  activation: Callable = nn.relu
  dropout_rate: Optional[float] = None
  kernel_init: Callable = variance_scaling(2.0)
  dtype: Any = jnp.float32
  # Per-leaf preprocessing applied before the conv stack (the reference's
  # preprocessing_layers, encoding_network.py:83 — e.g. uint8 frames
  # scaled by 1/255).
  preprocessing: Optional[Callable] = None

  @nn.compact
  def __call__(self, observation, step_type=None, network_state=(),
               training: bool = False):
    leaves = jax.tree_util.tree_leaves(observation)
    processed = []
    for x in leaves:
      if self.preprocessing is not None:
        x = self.preprocessing(x)
      x = x.astype(self.dtype)
      if self.conv_layer_params and x.ndim >= 3:
        for filters, kernel, stride in self.conv_layer_params:
          x = nn.Conv(filters, (kernel, kernel), strides=(stride, stride),
                      kernel_init=self.kernel_init, dtype=self.dtype)(x)
          x = self.activation(x)
      # Flatten all inner dims (keep batch dims — assume 1 outer dim here;
      # callers vmap/reshape for time-stacked inputs).
      x = x.reshape(x.shape[0], -1)
      processed.append(x)
    x = processed[0] if len(processed) == 1 else jnp.concatenate(
        processed, axis=-1)
    for width in self.fc_layer_params:
      x = nn.Dense(width, kernel_init=self.kernel_init, dtype=self.dtype)(x)
      x = self.activation(x)
      if self.dropout_rate:
        x = nn.Dropout(self.dropout_rate, deterministic=not training)(x)
    return x, network_state


@register_factory
def make_encoding_network(input_spec, conv_layer_params=(),
                          fc_layer_params=(64, 64), activation=nn.relu,
                          dtype=jnp.float32) -> Network:
  module = EncoderModule(
      conv_layer_params=tuple(conv_layer_params),
      fc_layer_params=tuple(fc_layer_params),
      activation=activation, dtype=dtype)
  return Network(module, input_spec)
