"""Network factory registry: serializable architecture configs.

The reference's SavedModel embeds the whole graph, so a saved policy
restores with zero user code (``tf_agents/policies/policy_saver.py:103``).
Here the analogue is a *config*, not a graph: every ``make_*_network``
factory is registered and records how it was called
(``Network.build_config``), and ``build_network`` re-invokes the factory
from that config plus the specs stored in the policy manifest.

Only JSON-representable arguments are recorded; a handful of well-known
non-JSON values (activations, dtypes, projection classes) are encoded by
name. A factory call with an unrepresentable argument (e.g. a custom
``preprocessing`` callable) yields ``build_config = None`` and the policy
must then be loaded the explicit way (caller passes the policy object).
"""
from __future__ import annotations

import functools
import inspect
import json
from typing import Any, Callable, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

FACTORY_REGISTRY: Dict[str, Callable] = {}

_SPEC_PARAM_NAMES = ("input_spec", "observation_spec", "action_spec")

_NAMED_VALUES = {
    "relu": nn.relu, "tanh": nn.tanh, "elu": nn.elu, "gelu": nn.gelu,
    "sigmoid": nn.sigmoid, "swish": nn.swish,
}
_NAMED_DTYPES = {
    "float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16,
}


def _named_classes():
  # Deferred: projection networks import this module's sibling files.
  from agents_tpu.networks import projection_networks as pn
  return {
      "NormalProjection": pn.NormalProjection,
      "TanhNormalProjection": pn.TanhNormalProjection,
      "CategoricalProjection": pn.CategoricalProjection,
  }


def _encode_value(v):
  """Returns the JSON-encodable form of v, or raises TypeError."""
  for name, fn in _NAMED_VALUES.items():
    if v is fn:
      return {"__named__": name}
  for name, dt in _NAMED_DTYPES.items():
    if v is dt:
      return {"__dtype__": name}
  for name, cls in _named_classes().items():
    if v is cls:
      return {"__class__": name}
  json.dumps(v)  # raises TypeError if not representable
  return v


def _decode_value(v):
  if isinstance(v, dict):
    if "__named__" in v:
      return _NAMED_VALUES[v["__named__"]]
    if "__dtype__" in v:
      return _NAMED_DTYPES[v["__dtype__"]]
    if "__class__" in v:
      return _named_classes()[v["__class__"]]
  return v


def register_factory(fn: Callable) -> Callable:
  """Decorator: registers `fn` and stamps returned networks with a
  rebuildable ``build_config``."""
  FACTORY_REGISTRY[fn.__name__] = fn

  @functools.wraps(fn)
  def wrapper(*args, **kwargs):
    net = fn(*args, **kwargs)
    try:
      bound = inspect.signature(fn).bind(*args, **kwargs)
      cfg = {}
      for name, val in bound.arguments.items():
        if name in _SPEC_PARAM_NAMES:
          continue
        cfg[name] = _encode_value(val)
      net.build_config = {"factory": fn.__name__, "kwargs": cfg}
    except TypeError:
      net.build_config = None  # unrepresentable arg; explicit load only
    return net

  # The registry must hold the wrapped version so nested factory calls
  # (make_sac_actor_network -> make_actor_distribution_network) and
  # build_network() go through the same stamping path.
  FACTORY_REGISTRY[fn.__name__] = wrapper
  return wrapper


def build_network(config: dict, observation_spec, action_spec=None):
  """Rebuild a Network from ``build_config`` + manifest specs."""
  factory = FACTORY_REGISTRY.get(config["factory"])
  if factory is None:
    raise KeyError(
        f"Unknown network factory '{config['factory']}'. Registered: "
        f"{sorted(FACTORY_REGISTRY)}")
  sig = inspect.signature(factory)
  call_kwargs = {}
  for name in sig.parameters:
    if name in ("input_spec", "observation_spec"):
      call_kwargs[name] = observation_spec
    elif name == "action_spec":
      if action_spec is None:
        raise ValueError(f"{config['factory']} needs an action_spec")
      call_kwargs[name] = action_spec
  for name, val in config.get("kwargs", {}).items():
    call_kwargs[name] = _decode_value(val)
  return factory(**call_kwargs)
