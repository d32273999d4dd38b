"""Network combinators: Sequential, NestMap, and small layer utilities.

Analogues of ``tf_agents/networks/sequential.py:59`` (layer chain with
per-layer nested state), ``nest_map.py`` (apply nets across pytrees),
``mask_splitter_network.py``, and the ``keras_layers`` utilities
(``inner_reshape.py:25``, ``BiasLayer``, ``squashed_outer_wrapper.py:31``).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from agents_tpu.networks.network import Network


class SequentialModule(nn.Module):
  """Chains sub-modules; each may be a linen module (stateless call) or a
  (module, has_state) pair convention: modules whose __call__ returns
  (out, state) participate in state threading."""
  layers: Sequence[Any]

  @nn.compact
  def __call__(self, inputs, step_type=None, network_state=()):
    x = inputs
    states = list(network_state) if isinstance(network_state, (list, tuple)) \
        and len(network_state) == len(self.layers) else [()] * len(
            self.layers)

    def _takes_state(layer):
      import inspect
      try:
        fn = layer.__call__ if not inspect.isfunction(layer) else layer
        params = inspect.signature(fn).parameters
      except (TypeError, ValueError):
        return True  # builtins without signatures: assume full protocol
      if any(p.kind == inspect.Parameter.VAR_POSITIONAL
             for p in params.values()):
        return True
      positional = [p for p in params.values()
                    if p.kind in (inspect.Parameter.POSITIONAL_ONLY,
                                  inspect.Parameter.POSITIONAL_OR_KEYWORD)
                    and p.name != "self"]
      return len(positional) >= 3
    new_states = []
    for layer, st in zip(self.layers, states):
      # Dispatch on the layer's signature, not try/except TypeError: a
      # TypeError raised INSIDE a stateful layer's body must propagate,
      # not trigger a silent single-arg re-call (which could also create
      # a divergent flax param tree if the first call already registered
      # parameters).
      if _takes_state(layer):
        out = layer(x, step_type, st)
        if isinstance(out, tuple) and len(out) == 2:
          x, st_new = out
        else:
          x, st_new = out, ()
      else:
        x, st_new = layer(x), ()
      new_states.append(st_new)
    return x, tuple(new_states)


def sequential(layers, input_spec, state_spec=()) -> Network:
  return Network(SequentialModule(layers=tuple(layers)), input_spec,
                 state_spec)


class NestMapModule(nn.Module):
  """Applies a pytree of modules leaf-wise to a matching input pytree
  (nest_map.py)."""
  modules: Any  # pytree of modules

  @nn.compact
  def __call__(self, inputs, step_type=None, network_state=()):
    flat_mods = jax.tree_util.tree_leaves(
        self.modules, is_leaf=lambda m: isinstance(m, nn.Module))
    treedef = jax.tree_util.tree_structure(
        self.modules, is_leaf=lambda m: isinstance(m, nn.Module))
    flat_in = treedef.flatten_up_to(inputs)
    outs = [m(x) for m, x in zip(flat_mods, flat_in)]
    return jax.tree_util.tree_unflatten(treedef, outs), network_state


def inner_reshape(inner_shape, inner_rank: int = 1):
  """Reshape the trailing `inner_rank` dims to `inner_shape`, keeping ALL
  outer dims (inner_reshape.py:25) — a [B, T, 16] sequence input with
  inner_shape=(4, 4) becomes [B, T, 4, 4], not a reshape that collapses
  the time axis."""

  def fn(x):
    return x.reshape(x.shape[:x.ndim - inner_rank] + tuple(inner_shape))

  return fn


class BiasLayer(nn.Module):
  """Learnable bias only (keras_layers/bias_layer.py)."""

  @nn.compact
  def __call__(self, x):
    bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
    return x + bias


def mask_splitter(splitter_fn):
  """Returns an observation_and_action_constraint_splitter callable
  (mask_splitter_network.py semantics): obs -> (network_obs, mask)."""
  return splitter_fn
