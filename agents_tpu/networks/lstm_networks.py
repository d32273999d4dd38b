"""Recurrent networks: LSTM encoder with episode-reset masking.

Analogues of ``tf_agents/networks/lstm_encoding_network.py``,
``q_rnn_network.py``, ``value_rnn_network.py``,
``actor_distribution_rnn_network.py`` and the reset-masked unroll in
``keras_layers/dynamic_unroll_layer.py:111``: on a FIRST step the carried
LSTM state is zeroed before the cell update, so episodes never leak state
across boundaries.

TPU shape: the input and output MLPs run time-parallel over ``[B*T, F]``
(batched MXU matmuls); only the LSTM cell itself is a sequential
``nn.scan``. Single-step ``[B, ...]`` inputs are handled as ``T=1``.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from agents_tpu.networks.network import Network, _uniform_symmetric
from agents_tpu.networks.projection_networks import (
    NormalProjection, default_projection)
from agents_tpu.specs import array_spec
from agents_tpu.trajectories import time_step as ts
from agents_tpu.networks.registry import register_factory


class _MaskedLSTMCell(nn.Module):
  """LSTM cell that zeroes its carry where the step is FIRST."""
  lstm_size: int
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, carry, inp):
    x_t, first_t = inp
    keep = (1.0 - first_t.astype(self.dtype))[:, None]
    carry = jax.tree_util.tree_map(lambda c: c * keep, carry)
    carry, y = nn.OptimizedLSTMCell(self.lstm_size, dtype=self.dtype)(
        carry, x_t)
    return carry, y


class LSTMEncoderModule(nn.Module):
  """input MLP -> reset-masked LSTM -> output MLP.

  Accepts [B, ...] single-step or [B, T, ...] sequence observations (the
  reference distinguishes these via outer-rank inference,
  lstm_encoding_network.py:210-260). network_state is (c, h), each
  [B, lstm_size].
  """
  input_fc_layer_params: Sequence[int] = (40,)
  lstm_size: int = 40
  output_fc_layer_params: Sequence[int] = (40,)
  activation: Callable = nn.relu
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, observation, step_type=None, network_state=None):
    leaves = jax.tree_util.tree_leaves(observation)
    batch = leaves[0].shape[0]
    # Outer rank: does step_type carry a time dim?
    has_time = step_type is not None and jnp.ndim(step_type) == 2

    if step_type is None:
      step_type = jnp.full((batch,), ts.StepType.MID, jnp.int32)
    if not has_time:
      observation = jax.tree_util.tree_map(
          lambda x: x[:, None], observation)
      step_type = step_type[:, None]
    T = step_type.shape[1]

    if network_state is None or (isinstance(network_state, tuple)
                                 and network_state == ()):
      zeros = jnp.zeros((batch, self.lstm_size), self.dtype)
      network_state = (zeros, zeros)

    # Time-parallel input MLP on [B*T, F].
    flat = [
        x.reshape(batch * T, -1).astype(self.dtype)
        for x in jax.tree_util.tree_leaves(observation)
    ]
    x = flat[0] if len(flat) == 1 else jnp.concatenate(flat, -1)
    for width in self.input_fc_layer_params:
      x = self.activation(nn.Dense(width, dtype=self.dtype)(x))
    x = x.reshape(batch, T, -1)

    # Sequential cell over time (time-major scan).
    x_tm = jnp.moveaxis(x, 1, 0)                       # [T, B, F]
    first_tm = jnp.moveaxis(
        (step_type == ts.StepType.FIRST), 1, 0)        # [T, B]
    ScanCell = nn.scan(
        _MaskedLSTMCell, variable_broadcast="params",
        split_rngs={"params": False}, in_axes=0, out_axes=0)
    carry, ys = ScanCell(self.lstm_size, self.dtype)(
        network_state, (x_tm, first_tm))
    y = jnp.moveaxis(ys, 0, 1).reshape(batch * T, -1)  # [B*T, H]

    for width in self.output_fc_layer_params:
      y = self.activation(nn.Dense(width, dtype=self.dtype)(y))
    y = y.reshape(batch, T, -1)
    if not has_time:
      y = y[:, 0]
    return y, carry


class QRnnModule(nn.Module):
  """LSTM encoder + Q head (q_rnn_network.py)."""
  num_actions: int
  input_fc_layer_params: Sequence[int] = (40,)
  lstm_size: int = 40
  output_fc_layer_params: Sequence[int] = (40,)
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, observation, step_type=None, network_state=None):
    y, state = LSTMEncoderModule(
        input_fc_layer_params=self.input_fc_layer_params,
        lstm_size=self.lstm_size,
        output_fc_layer_params=self.output_fc_layer_params,
        dtype=self.dtype)(observation, step_type, network_state)
    q = nn.Dense(self.num_actions, kernel_init=_uniform_symmetric(0.03),
                 bias_init=nn.initializers.constant(-0.2),
                 dtype=self.dtype)(y)
    return q.astype(jnp.float32), state


class ValueRnnModule(nn.Module):
  input_fc_layer_params: Sequence[int] = (40,)
  lstm_size: int = 40
  output_fc_layer_params: Sequence[int] = (40,)
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, observation, step_type=None, network_state=None):
    y, state = LSTMEncoderModule(
        input_fc_layer_params=self.input_fc_layer_params,
        lstm_size=self.lstm_size,
        output_fc_layer_params=self.output_fc_layer_params,
        dtype=self.dtype)(observation, step_type, network_state)
    v = nn.Dense(1, dtype=self.dtype)(y)
    return jnp.squeeze(v, -1).astype(jnp.float32), state


class ActorDistributionRnnModule(nn.Module):
  action_spec: Any
  input_fc_layer_params: Sequence[int] = (40,)
  lstm_size: int = 40
  output_fc_layer_params: Sequence[int] = (40,)
  continuous_projection: Any = NormalProjection
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, observation, step_type=None, network_state=None):
    y, state = LSTMEncoderModule(
        input_fc_layer_params=self.input_fc_layer_params,
        lstm_size=self.lstm_size,
        output_fc_layer_params=self.output_fc_layer_params,
        dtype=self.dtype)(observation, step_type, network_state)
    leaves, treedef = jax.tree_util.tree_flatten(
        self.action_spec,
        is_leaf=lambda s: isinstance(s, array_spec.ArraySpec))
    dists = [
        default_projection(spec, self.continuous_projection)(y)
        for spec in leaves
    ]
    return jax.tree_util.tree_unflatten(treedef, dists), state


def _lstm_state_spec(lstm_size: int):
  return (array_spec.ArraySpec((lstm_size,), np.float32, "lstm_c"),
          array_spec.ArraySpec((lstm_size,), np.float32, "lstm_h"))


@register_factory
def make_q_rnn_network(input_spec, action_spec, input_fc_layer_params=(40,),
                       lstm_size=40, output_fc_layer_params=(40,),
                       dtype=jnp.float32) -> Network:
  from agents_tpu.networks.q_network import _num_actions
  module = QRnnModule(
      num_actions=_num_actions(action_spec),
      input_fc_layer_params=tuple(input_fc_layer_params),
      lstm_size=lstm_size,
      output_fc_layer_params=tuple(output_fc_layer_params), dtype=dtype)
  return Network(module, input_spec, state_spec=_lstm_state_spec(lstm_size))


@register_factory
def make_value_rnn_network(input_spec, input_fc_layer_params=(40,),
                           lstm_size=40, output_fc_layer_params=(40,),
                           dtype=jnp.float32) -> Network:
  module = ValueRnnModule(
      input_fc_layer_params=tuple(input_fc_layer_params),
      lstm_size=lstm_size,
      output_fc_layer_params=tuple(output_fc_layer_params), dtype=dtype)
  return Network(module, input_spec, state_spec=_lstm_state_spec(lstm_size))


@register_factory
def make_actor_distribution_rnn_network(
    input_spec, action_spec, input_fc_layer_params=(40,), lstm_size=40,
    output_fc_layer_params=(40,), continuous_projection=NormalProjection,
    dtype=jnp.float32) -> Network:
  module = ActorDistributionRnnModule(
      action_spec=action_spec,
      input_fc_layer_params=tuple(input_fc_layer_params),
      lstm_size=lstm_size,
      output_fc_layer_params=tuple(output_fc_layer_params),
      continuous_projection=continuous_projection, dtype=dtype)
  net = Network(module, input_spec, state_spec=_lstm_state_spec(lstm_size))
  net.action_spec = action_spec
  return net
