"""Network base machinery.

Analogue of ``tf_agents/networks/network.py:111``. In JAX, a "network" is a
flax.linen module plus the specs it was built from; parameters live outside
the object. `create_variables` (reference :188,:571) becomes `init_params`:
build zero inputs from specs and call `module.init`.

Networks follow the reference calling convention:
    output, new_state = net.apply(params, observation, step_type, state)
Stateless networks use `state=()` and return it unchanged. RNN state specs
are inferred like `get_state_spec` (reference :715).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from agents_tpu.specs import array_spec
from agents_tpu.trajectories import time_step as ts


def variance_scaling(scale=2.0):
  """The reference's default encoder initializer: VarianceScaling(2.0,
  fan_in, truncated_normal) (examples/dqn/dqn_train_eval.py:118)."""
  return nn.initializers.variance_scaling(scale, "fan_in", "truncated_normal")


def _uniform_symmetric(scale):
  def init(key, shape, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, -scale, scale)
  return init


class Network:
  """Wraps a linen module with the spec-driven lifecycle.

  Attributes:
    module: the flax.linen module.
    input_spec: observation spec nest the module consumes.
    state_spec: nest of ArraySpec for recurrent state ((), if stateless).
  """

  def __init__(self, module: nn.Module, input_spec, state_spec=()):
    self.module = module
    self.input_spec = input_spec
    self.state_spec = state_spec
    # Serializable architecture config stamped by registry.register_factory
    # (None for hand-assembled networks -> explicit-load path only).
    self.build_config = None

  def init_params(self, key, batch_size: int = 1):
    """Create parameters from specs (reference create_variables :188)."""
    obs = array_spec.zero_spec_nest(self.input_spec, outer_dims=(batch_size,))
    step_type = jnp.zeros((batch_size,), jnp.int32)
    state = self.init_state(batch_size)
    return self.module.init(key, obs, step_type, state)

  def init_state(self, batch_size: Optional[int] = None):
    """Zero recurrent state (reference get_initial_state)."""
    outer = () if batch_size is None else (batch_size,)
    return array_spec.zero_spec_nest(self.state_spec, outer_dims=outer)

  def apply(self, params, observation, step_type=None, state=(),
            **kwargs) -> Tuple[Any, Any]:
    return self.module.apply(params, observation, step_type, state, **kwargs)

  def copy(self) -> "Network":
    """Same architecture, fresh parameter lineage (reference copy :341) —
    parameters are external so a copy is just the same wrapper. Factory
    stampings (build_config, action_spec, num_atoms, ...) carry over:
    without them a copied categorical-q net loses `num_atoms` and a
    saved policy built on a copy loses its self-contained restore."""
    new = Network(self.module, self.input_spec, self.state_spec)
    for k, v in self.__dict__.items():
      if k not in new.__dict__ or new.__dict__[k] is None:
        setattr(new, k, v)
    return new
