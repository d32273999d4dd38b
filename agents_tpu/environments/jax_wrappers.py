"""Device-level (JaxEnvironment) wrappers.

Analogue of ``tf_agents/environments/tf_wrappers.py`` (:30
TFEnvironmentBaseWrapper, :72 OneHotActionWrapper): the reference wraps
in-graph TFEnvironments; here the same surface wraps functional
JaxEnvironments, staying trace-safe so wrapped envs still vmap/scan under
jit inside `BatchedJaxEnv` and the fused loops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from agents_tpu.environments.jax_environment import JaxEnvironment
from agents_tpu.specs import array_spec


class JaxEnvironmentWrapper(JaxEnvironment):
  """Base wrapper: delegates everything to the wrapped env (reference
  TFEnvironmentBaseWrapper, tf_wrappers.py:30-69)."""

  def __init__(self, env: JaxEnvironment):
    self._env = env

  def __getattr__(self, name):
    if name.startswith("_"):
      raise AttributeError(name)
    return getattr(self._env, name)

  @property
  def wrapped_env(self) -> JaxEnvironment:
    return self._env

  def observation_spec(self):
    return self._env.observation_spec()

  def action_spec(self):
    return self._env.action_spec()

  def reward_spec(self):
    return self._env.reward_spec()

  def reset(self, key):
    return self._env.reset(key)

  def step(self, state, action, key):
    return self._env.step(state, action, key)


class OneHotActionJaxWrapper(JaxEnvironmentWrapper):
  """Exposes a one-hot float action spec over a scalar discrete env
  (reference OneHotActionWrapper, tf_wrappers.py:72-118): incoming
  one-hot vectors are argmax-decoded before delegating. Lets
  continuous-action machinery (e.g. CEM one-hot samplers) drive discrete
  envs."""

  def __init__(self, env: JaxEnvironment):
    super().__init__(env)
    spec = env.action_spec()
    if spec.shape != () or not np.issubdtype(spec.dtype, np.integer):
      raise ValueError(
          f"OneHotActionJaxWrapper needs a scalar integer action spec, "
          f"got {spec}")
    self._minimum = int(spec.minimum)
    self._num_actions = int(spec.maximum) - self._minimum + 1

  def action_spec(self):
    return array_spec.BoundedArraySpec(
        (self._num_actions,), np.float32, 0.0, 1.0, "one_hot_action")

  def step(self, state, action, key):
    index = jnp.argmax(action, axis=-1).astype(jnp.int32) + self._minimum
    return self._env.step(state, index, key)
