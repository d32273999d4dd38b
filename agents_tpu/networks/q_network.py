"""Q-value networks: plain, dueling, and categorical (C51).

Analogues of ``tf_agents/networks/q_network.py:43``,
``dueling_q_network.py``, ``categorical_q_network.py``.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from agents_tpu.networks.encoding_network import EncoderModule
from agents_tpu.networks.network import Network, variance_scaling, _uniform_symmetric
from agents_tpu.specs import array_spec
from agents_tpu.networks.registry import register_factory


def _num_actions(action_spec) -> int:
  leaves = jax.tree_util.tree_leaves(
      action_spec, is_leaf=lambda x: isinstance(x, array_spec.ArraySpec))
  if len(leaves) != 1:
    raise ValueError("Q networks require a single discrete action spec")
  spec = leaves[0]
  if not isinstance(spec, array_spec.BoundedArraySpec):
    raise ValueError("Q networks require a bounded action spec")
  return spec.num_values


class QModule(nn.Module):
  num_actions: int
  conv_layer_params: Sequence[Tuple[int, int, int]] = ()
  fc_layer_params: Sequence[int] = (64, 64)
  activation: Callable = nn.relu
  dtype: Any = jnp.float32
  preprocessing: Optional[Callable] = None

  @nn.compact
  def __call__(self, observation, step_type=None, network_state=()):
    x, network_state = EncoderModule(
        conv_layer_params=self.conv_layer_params,
        fc_layer_params=self.fc_layer_params,
        activation=self.activation, dtype=self.dtype,
        preprocessing=self.preprocessing)(
            observation, step_type, network_state)
    # Reference QNetwork final layer: RandomUniform(-0.03, 0.03) kernel,
    # constant -0.2 bias (q_network.py:157-163).
    q = nn.Dense(self.num_actions, kernel_init=_uniform_symmetric(0.03),
                 bias_init=nn.initializers.constant(-0.2),
                 dtype=self.dtype)(x)
    return q.astype(jnp.float32), network_state


class DuelingQModule(nn.Module):
  """Dueling heads: Q = V + A - mean(A) (dueling_q_network.py)."""
  num_actions: int
  conv_layer_params: Sequence[Tuple[int, int, int]] = ()
  fc_layer_params: Sequence[int] = (64, 64)
  activation: Callable = nn.relu
  dtype: Any = jnp.float32
  preprocessing: Optional[Callable] = None

  @nn.compact
  def __call__(self, observation, step_type=None, network_state=()):
    x, network_state = EncoderModule(
        conv_layer_params=self.conv_layer_params,
        fc_layer_params=self.fc_layer_params,
        activation=self.activation, dtype=self.dtype,
        preprocessing=self.preprocessing)(
            observation, step_type, network_state)
    v = nn.Dense(1, kernel_init=_uniform_symmetric(0.03),
                 bias_init=nn.initializers.constant(-0.2),
                 dtype=self.dtype)(x)
    a = nn.Dense(self.num_actions, kernel_init=_uniform_symmetric(0.03),
                 bias_init=nn.initializers.constant(-0.2),
                 dtype=self.dtype)(x)
    q = v + a - jnp.mean(a, axis=-1, keepdims=True)
    return q.astype(jnp.float32), network_state


class CategoricalQModule(nn.Module):
  """C51: logits over `num_atoms` per action (categorical_q_network.py)."""
  num_actions: int
  num_atoms: int = 51
  conv_layer_params: Sequence[Tuple[int, int, int]] = ()
  fc_layer_params: Sequence[int] = (64, 64)
  activation: Callable = nn.relu
  dtype: Any = jnp.float32
  preprocessing: Optional[Callable] = None

  @nn.compact
  def __call__(self, observation, step_type=None, network_state=()):
    x, network_state = EncoderModule(
        conv_layer_params=self.conv_layer_params,
        fc_layer_params=self.fc_layer_params,
        activation=self.activation, dtype=self.dtype,
        preprocessing=self.preprocessing)(
            observation, step_type, network_state)
    logits = nn.Dense(self.num_actions * self.num_atoms,
                      kernel_init=_uniform_symmetric(0.03),
                      dtype=self.dtype)(x)
    logits = logits.reshape(logits.shape[:-1] + (self.num_actions,
                                                 self.num_atoms))
    return logits.astype(jnp.float32), network_state


@register_factory
def make_q_network(input_spec, action_spec, conv_layer_params=(),
                   fc_layer_params=(64, 64), activation=nn.relu,
                   dueling: bool = False, dtype=jnp.float32,
                   preprocessing=None) -> Network:
  cls = DuelingQModule if dueling else QModule
  module = cls(num_actions=_num_actions(action_spec),
               conv_layer_params=tuple(conv_layer_params),
               fc_layer_params=tuple(fc_layer_params),
               activation=activation, dtype=dtype,
               preprocessing=preprocessing)
  return Network(module, input_spec)


@register_factory
def make_categorical_q_network(input_spec, action_spec, num_atoms=51,
                               conv_layer_params=(), fc_layer_params=(64, 64),
                               activation=nn.relu,
                               dtype=jnp.float32) -> Network:
  module = CategoricalQModule(
      num_actions=_num_actions(action_spec), num_atoms=num_atoms,
      conv_layer_params=tuple(conv_layer_params),
      fc_layer_params=tuple(fc_layer_params), activation=activation,
      dtype=dtype)
  net = Network(module, input_spec)
  net.num_atoms = num_atoms
  return net
