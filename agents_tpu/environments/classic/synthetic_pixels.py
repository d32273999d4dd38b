"""Synthetic Atari-shaped pixel environment (84x84x4 uint8, on device).

The reference proves its conv path on ALE Atari (``examples/dqn/mnih15``,
``benchmark/dqn_benchmark.py:57-73``). ale-py is absent from this image,
so this env drives the identical compute — the mnih15 conv Q-network over
frame-stacked 84x84 uint8 observations, uint8 replay storage, the fused
collect+train loop — with a trivially cheap on-device observation
generator (one broadcasted integer pattern per step, ~28 KB of
element-wise ops vs ~19 MFLOP of conv per sample, <0.2% of the work).

Task: a hidden target action in [0, num_actions) is encoded into the
pixel pattern; matching it yields reward 1. Learnable, so throughput
numbers come from a loop that is actually training, but the task itself
is irrelevant — the env exists to measure the Atari-scale DQN iteration
(SURVEY.md §6 conv-path perf evidence).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from agents_tpu.environments.jax_environment import JaxEnvironment
from agents_tpu.specs import array_spec
from agents_tpu.trajectories import time_step as ts


@struct.dataclass
class SyntheticPixelsState:
  target: jax.Array  # int32: current rewarded action
  t: jax.Array       # int32: step within episode


class SyntheticPixels(JaxEnvironment):
  """84x84x`frames` uint8 observations at the mnih15 operating shape."""

  def __init__(self, size: int = 84, frames: int = 4,
               num_actions: int = 6, horizon: int = 500):
    self.size = size
    self.frames = frames
    self.num_actions = num_actions
    self.horizon = horizon

  def observation_spec(self):
    return array_spec.BoundedArraySpec(
        (self.size, self.size, self.frames), np.uint8, 0, 255, "pixels")

  def action_spec(self):
    return array_spec.BoundedArraySpec((), np.int32, 0,
                                       self.num_actions - 1, "action")

  def _obs(self, state: SyntheticPixelsState):
    r = jnp.arange(self.size, dtype=jnp.int32)[:, None, None]
    c = jnp.arange(self.size, dtype=jnp.int32)[None, :, None]
    f = jnp.arange(self.frames, dtype=jnp.int32)[None, None, :]
    # The target action modulates the pattern so the task is learnable
    # from pixels; everything stays uint8-range integer math.
    pat = (r * 3 + c * 5 + f * 7
           + state.target * 41 + state.t * 13) % 251
    return pat.astype(jnp.uint8)

  def reset(self, key):
    state = SyntheticPixelsState(
        target=jax.random.randint(key, (), 0, self.num_actions,
                                  jnp.int32),
        t=jnp.zeros((), jnp.int32))
    return state, ts.restart(self._obs(state))

  def step(self, state: SyntheticPixelsState, action, key):
    hit = action.astype(jnp.int32) == state.target
    reward = hit.astype(jnp.float32)
    new_target = jax.random.randint(key, (), 0, self.num_actions,
                                    jnp.int32)
    t = state.t + 1
    new_state = SyntheticPixelsState(target=new_target, t=t)
    done = t >= self.horizon
    return new_state, ts.TimeStep(
        step_type=jnp.where(done, ts.StepType.LAST,
                            ts.StepType.MID).astype(jnp.int32),
        reward=reward,
        discount=jnp.where(done, 0.0, 1.0).astype(jnp.float32),
        observation=self._obs(new_state))
