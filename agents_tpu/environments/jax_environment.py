"""Pure-JAX environments: step thousands of instances in lockstep under jit.

This is the TPU-native inversion of the reference's environment stack
(``tf_agents/environments/py_environment.py:38`` +
``tf_py_environment.py:68``): instead of bridging host envs into the graph
via numpy_function, on-device envs ARE jitted pure functions —
``reset(key) -> (state, TimeStep)`` and
``step(state, action, key) -> (state, TimeStep)`` for one instance; drivers
`vmap` them over the batch and `lax.scan` them over time.

Auto-reset follows the reference protocol (py_environment.py:203-240):
stepping a LAST time step restarts the episode. `BatchedJaxEnv.step`
implements that with a masked select, so episodes of different lengths run
in lockstep.
"""
from __future__ import annotations

import abc
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from agents_tpu.specs import array_spec
from agents_tpu.trajectories import time_step as ts


class JaxEnvironment(abc.ABC):
  """Single-instance functional environment.

  Subclasses define specs and the pure `_reset`/`_step` dynamics. All
  methods must be trace-safe (static shapes, no Python control flow on
  traced values).
  """

  @abc.abstractmethod
  def observation_spec(self):
    ...

  @abc.abstractmethod
  def action_spec(self):
    ...

  def reward_spec(self):
    return array_spec.ArraySpec((), np.float32, name="reward")

  def time_step_spec(self):
    return ts.time_step_spec(self.observation_spec(), self.reward_spec())

  @abc.abstractmethod
  def reset(self, key) -> Tuple[Any, ts.TimeStep]:
    """Start a new episode: returns (env_state, FIRST time step)."""

  @abc.abstractmethod
  def step(self, state, action, key) -> Tuple[Any, ts.TimeStep]:
    """Advance one step: returns (env_state, time step). No auto-reset —
    `BatchedJaxEnv` layers that on."""


class BatchedJaxEnv:
  """Vectorizes a `JaxEnvironment` over a leading batch axis with auto-reset.

  The analogue of `BatchedPyEnvironment` (batched_py_environment.py:41) +
  the auto-reset protocol, but as one fused jitted step: where the previous
  time step was LAST the instance is re-initialized (fresh RNG fold), and
  the emitted time step is FIRST.
  """

  def __init__(self, env: JaxEnvironment, batch_size: int):
    self.env = env
    self.batch_size = batch_size
    self._reset1 = env.reset
    self._step1 = env.step
    # Envs whose state carries monotone env time (bandit `round`) define
    # auto_reset(stepped_state, key) so the auto-reset path does NOT
    # rewind them to t=0 — without this every length-1 bandit episode
    # froze non-stationary envs at round 0.
    if hasattr(env, "auto_reset"):
      self._autoreset1 = env.auto_reset
    else:
      self._autoreset1 = lambda _stepped, k: self._reset1(k)

  def observation_spec(self):
    return self.env.observation_spec()

  def action_spec(self):
    return self.env.action_spec()

  def reward_spec(self):
    return self.env.reward_spec()

  def time_step_spec(self):
    return self.env.time_step_spec()

  def reset(self, key):
    keys = jax.random.split(key, self.batch_size)
    return jax.vmap(self._reset1)(keys)

  def step(self, state, prev_time_step: ts.TimeStep, action, key):
    """Lockstep batch step with auto-reset on LAST.

    Returns (new_state, new_time_step). Matches reference auto-reset: the
    action given on a LAST step is discarded and a FIRST step is returned
    (py_environment.py:203-240).
    """
    step_keys, reset_keys = jax.vmap(
        lambda k: tuple(jax.random.split(k)))(jax.random.split(
            key, self.batch_size))

    stepped_state, stepped_ts = jax.vmap(self._step1)(state, action, step_keys)
    # auto_reset sees the PRE-step state: on a LAST frame the incoming
    # action is discarded, and for bandits that state already holds the
    # next round's context/round counter.
    reset_state, reset_ts = jax.vmap(self._autoreset1)(state, reset_keys)

    needs_reset = prev_time_step.is_last()

    def _sel(r, s):
      extra = r.ndim - 1
      cond = needs_reset.reshape(needs_reset.shape + (1,) * extra)
      return jnp.where(cond, r, s)

    new_state = jax.tree_util.tree_map(_sel, reset_state, stepped_state)
    new_ts = jax.tree_util.tree_map(_sel, reset_ts, stepped_ts)
    return new_state, new_ts
