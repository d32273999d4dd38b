"""State-value and critic (obs+action) networks.

Analogues of ``tf_agents/networks/value_network.py`` and
``tf_agents/agents/ddpg/critic_network.py`` (used by DDPG/TD3/SAC — the
reference keeps CriticNetwork under agents/ddpg; here it is a network).
"""
from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from agents_tpu.networks.encoding_network import EncoderModule
from agents_tpu.networks.network import Network, _uniform_symmetric
from agents_tpu.networks.registry import register_factory


class ValueModule(nn.Module):
  fc_layer_params: Sequence[int] = (64, 64)
  conv_layer_params: Sequence[Tuple[int, int, int]] = ()
  activation: Callable = nn.relu
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, observation, step_type=None, network_state=()):
    x, network_state = EncoderModule(
        conv_layer_params=self.conv_layer_params,
        fc_layer_params=self.fc_layer_params,
        activation=self.activation, dtype=self.dtype)(
            observation, step_type, network_state)
    v = nn.Dense(1, kernel_init=_uniform_symmetric(0.03),
                 dtype=self.dtype)(x)
    return jnp.squeeze(v, -1).astype(jnp.float32), network_state


class CriticModule(nn.Module):
  """Q(s, a) for continuous actions (ddpg/critic_network.py:50).

  observation and action are encoded separately then joined, matching the
  reference's obs-fc -> concat(action) -> joint-fc layout.
  """
  observation_fc_layer_params: Sequence[int] = ()
  joint_fc_layer_params: Sequence[int] = (256, 256)
  activation: Callable = nn.relu
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, observation_and_action, step_type=None,
               network_state=()):
    observation, action = observation_and_action
    obs_leaves = [
        x.reshape(x.shape[0], -1).astype(self.dtype)
        for x in jax.tree_util.tree_leaves(observation)
    ]
    x = obs_leaves[0] if len(obs_leaves) == 1 else jnp.concatenate(
        obs_leaves, -1)
    for width in self.observation_fc_layer_params:
      x = nn.Dense(width, dtype=self.dtype)(x)
      x = self.activation(x)
    act_leaves = [
        a.reshape(a.shape[0], -1).astype(self.dtype)
        for a in jax.tree_util.tree_leaves(action)
    ]
    x = jnp.concatenate([x] + act_leaves, axis=-1)
    for width in self.joint_fc_layer_params:
      x = nn.Dense(width, dtype=self.dtype)(x)
      x = self.activation(x)
    q = nn.Dense(1, kernel_init=_uniform_symmetric(0.003),
                 dtype=self.dtype)(x)
    return jnp.squeeze(q, -1).astype(jnp.float32), network_state


@register_factory
def make_value_network(input_spec, fc_layer_params=(64, 64),
                       conv_layer_params=(), activation=nn.relu,
                       dtype=jnp.float32) -> Network:
  module = ValueModule(fc_layer_params=tuple(fc_layer_params),
                       conv_layer_params=tuple(conv_layer_params),
                       activation=activation, dtype=dtype)
  return Network(module, input_spec)


@register_factory
def make_critic_network(observation_spec, action_spec,
                        observation_fc_layer_params=(),
                        joint_fc_layer_params=(256, 256), activation=nn.relu,
                        dtype=jnp.float32) -> Network:
  module = CriticModule(
      observation_fc_layer_params=tuple(observation_fc_layer_params),
      joint_fc_layer_params=tuple(joint_fc_layer_params),
      activation=activation, dtype=dtype)
  return Network(module, (observation_spec, action_spec))
