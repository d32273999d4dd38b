"""Actor networks: observation -> nest of distributions.

Analogue of ``tf_agents/networks/actor_distribution_network.py`` (and the
deterministic ``agents/ddpg/actor_network.py``).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from agents_tpu.networks.encoding_network import EncoderModule
from agents_tpu.networks.network import Network, _uniform_symmetric
from agents_tpu.networks.projection_networks import (
    NormalProjection, TanhNormalProjection, default_projection)
from agents_tpu.specs import array_spec
from agents_tpu.networks.registry import register_factory


class ActorDistributionModule(nn.Module):
  """Encoder + per-action-leaf projection heads.

  `action_spec` is a static pytree of BoundedArraySpec; the output is the
  same pytree with each spec replaced by its distribution.
  """
  action_spec: Any
  conv_layer_params: Sequence[Tuple[int, int, int]] = ()
  fc_layer_params: Sequence[int] = (200, 100)
  activation: Callable = nn.relu
  continuous_projection: Any = NormalProjection
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, observation, step_type=None, network_state=()):
    x, network_state = EncoderModule(
        conv_layer_params=self.conv_layer_params,
        fc_layer_params=self.fc_layer_params,
        activation=self.activation, dtype=self.dtype)(
            observation, step_type, network_state)
    leaves, treedef = jax.tree_util.tree_flatten(
        self.action_spec, is_leaf=lambda s: isinstance(s, array_spec.ArraySpec))
    dists = [
        default_projection(spec, self.continuous_projection)(x)
        for spec in leaves
    ]
    return jax.tree_util.tree_unflatten(treedef, dists), network_state


class DeterministicActorModule(nn.Module):
  """DDPG actor: obs -> tanh-scaled continuous action
  (ddpg/actor_network.py:36)."""
  action_spec: Any  # single BoundedArraySpec
  fc_layer_params: Sequence[int] = (256, 256)
  activation: Callable = nn.relu
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, observation, step_type=None, network_state=()):
    x, network_state = EncoderModule(
        fc_layer_params=self.fc_layer_params, activation=self.activation,
        dtype=self.dtype)(observation, step_type, network_state)
    spec = self.action_spec
    size = int(np.prod(spec.shape))
    a = nn.Dense(size, kernel_init=_uniform_symmetric(0.003),
                 dtype=self.dtype)(x)
    a = jnp.tanh(a.astype(jnp.float32))
    a = a.reshape(a.shape[:-1] + spec.shape)
    low = jnp.asarray(spec.minimum, jnp.float32)
    high = jnp.asarray(spec.maximum, jnp.float32)
    return low + (high - low) / 2.0 * (a + 1.0), network_state


@register_factory
def make_actor_distribution_network(
    input_spec, action_spec, conv_layer_params=(), fc_layer_params=(200, 100),
    activation=nn.relu, continuous_projection=NormalProjection,
    dtype=jnp.float32) -> Network:
  module = ActorDistributionModule(
      action_spec=action_spec, conv_layer_params=tuple(conv_layer_params),
      fc_layer_params=tuple(fc_layer_params), activation=activation,
      continuous_projection=continuous_projection, dtype=dtype)
  net = Network(module, input_spec)
  net.action_spec = action_spec
  return net


@register_factory
def make_sac_actor_network(input_spec, action_spec,
                           fc_layer_params=(256, 256),
                           activation=nn.relu, dtype=jnp.float32) -> Network:
  """Actor with TanhNormalProjection heads (SAC default)."""
  return make_actor_distribution_network(
      input_spec, action_spec, fc_layer_params=fc_layer_params,
      activation=activation, continuous_projection=TanhNormalProjection,
      dtype=dtype)


@register_factory
def make_deterministic_actor_network(input_spec, action_spec,
                                     fc_layer_params=(256, 256),
                                     activation=nn.relu,
                                     dtype=jnp.float32) -> Network:
  module = DeterministicActorModule(
      action_spec=action_spec, fc_layer_params=tuple(fc_layer_params),
      activation=activation, dtype=dtype)
  net = Network(module, input_spec)
  net.action_spec = action_spec
  return net
