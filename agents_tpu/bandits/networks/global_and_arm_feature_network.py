"""Per-arm reward networks.

Analogue of ``tf_agents/bandits/networks/
global_and_arm_feature_network.py``: a common tower over global features
and a per-arm tower over arm features, combined per arm (concat -> joint
tower -> scalar reward per arm). Output is [B, K] predicted rewards, so
per-arm agents plug into the same QPolicy machinery.

Also ``heteroscedastic_q_network.py``: a mean+log-variance head.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from agents_tpu.bandits.specs.bandit_spec_utils import (GLOBAL_FEATURE_KEY,
                                                        PER_ARM_FEATURE_KEY)
from agents_tpu.networks.network import Network


class GlobalAndArmFeatureModule(nn.Module):
  global_layers: Sequence[int] = (32,)
  arm_layers: Sequence[int] = (32,)
  common_layers: Sequence[int] = (32,)
  activation: Callable = nn.relu

  @nn.compact
  def __call__(self, observation, step_type=None, network_state=()):
    g = observation[GLOBAL_FEATURE_KEY].astype(jnp.float32)   # [B, gdim]
    arms = observation[PER_ARM_FEATURE_KEY].astype(jnp.float32)  # [B,K,adim]
    for w in self.global_layers:
      g = self.activation(nn.Dense(w)(g))
    a = arms
    for w in self.arm_layers:
      a = self.activation(nn.Dense(w)(a))                    # [B, K, w]
    K = a.shape[1]
    joint = jnp.concatenate(
        [jnp.repeat(g[:, None, :], K, axis=1), a], axis=-1)
    for w in self.common_layers:
      joint = self.activation(nn.Dense(w)(joint))
    reward = nn.Dense(1)(joint)[..., 0]                      # [B, K]
    return reward, network_state


def make_global_and_arm_feature_network(observation_spec,
                                        global_layers=(32,),
                                        arm_layers=(32,),
                                        common_layers=(32,)) -> Network:
  module = GlobalAndArmFeatureModule(
      global_layers=tuple(global_layers), arm_layers=tuple(arm_layers),
      common_layers=tuple(common_layers))
  return Network(module, observation_spec)


class HeteroscedasticQModule(nn.Module):
  """Mean + log-variance per action (heteroscedastic_q_network.py)."""
  num_actions: int
  fc_layers: Sequence[int] = (64,)
  activation: Callable = nn.relu

  @nn.compact
  def __call__(self, observation, step_type=None, network_state=()):
    x = jnp.concatenate([
        l.reshape(l.shape[0], -1).astype(jnp.float32)
        for l in jax.tree_util.tree_leaves(observation)
    ], axis=-1)
    for w in self.fc_layers:
      x = self.activation(nn.Dense(w)(x))
    mean = nn.Dense(self.num_actions)(x)
    log_var = nn.Dense(self.num_actions)(x)
    return (mean, log_var), network_state
