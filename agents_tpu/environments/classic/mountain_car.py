"""MountainCar (discrete + continuous) as pure-JAX environments.

Dynamics match Gym's classic ``MountainCar-v0`` and
``MountainCarContinuous-v0`` (Moore's mountain car), which the reference
reaches through ``suite_gym.load`` (tf_agents/environments/suite_gym.py:45).
The env is jitted and vmapped so thousands of instances step in lockstep
on-device.

Termination (goal reached) emits LAST with discount 0.0; time-limit
truncation emits LAST with discount 1.0 (the reference TimeLimit wrapper
semantics, tf_agents/environments/wrappers.py:99).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from agents_tpu.environments.jax_environment import JaxEnvironment
from agents_tpu.specs import array_spec
from agents_tpu.trajectories import time_step as ts

_MIN_POS = -1.2
_MAX_POS = 0.6
_MAX_SPEED = 0.07
_GOAL_POS = 0.5
_FORCE = 0.001
_GRAVITY = 0.0025

_C_MIN_POS = -1.2
_C_MAX_POS = 0.6
_C_MAX_SPEED = 0.07
_C_GOAL_POS = 0.45
_C_POWER = 0.0015


@struct.dataclass
class MountainCarState:
  physics: jax.Array     # [2]: position, velocity
  steps: jax.Array       # int32 scalar
  terminated: jax.Array  # bool scalar


class MountainCar(JaxEnvironment):
  """Discrete 3-action mountain car; max_episode_steps=200 mirrors v0."""

  def __init__(self, max_episode_steps: int = 200):
    self.max_episode_steps = max_episode_steps

  def observation_spec(self):
    return array_spec.BoundedArraySpec(
        (2,), np.float32,
        minimum=np.array([_MIN_POS, -_MAX_SPEED], np.float32),
        maximum=np.array([_MAX_POS, _MAX_SPEED], np.float32),
        name="observation")

  def action_spec(self):
    return array_spec.BoundedArraySpec((), np.int32, 0, 2, name="action")

  def reset(self, key):
    pos = jax.random.uniform(key, (), jnp.float32, -0.6, -0.4)
    physics = jnp.stack([pos, jnp.zeros((), jnp.float32)])
    state = MountainCarState(
        physics=physics,
        steps=jnp.zeros((), jnp.int32),
        terminated=jnp.zeros((), jnp.bool_))
    return state, ts.restart(physics)

  def step(self, state: MountainCarState, action, key):
    del key
    pos, vel = state.physics[0], state.physics[1]
    vel = vel + (action.astype(jnp.float32) - 1.0) * _FORCE + jnp.cos(
        3.0 * pos) * (-_GRAVITY)
    vel = jnp.clip(vel, -_MAX_SPEED, _MAX_SPEED)
    pos = jnp.clip(pos + vel, _MIN_POS, _MAX_POS)
    vel = jnp.where((pos <= _MIN_POS) & (vel < 0.0), 0.0, vel)
    physics = jnp.stack([pos, vel])

    steps = state.steps + 1
    terminated = (pos >= _GOAL_POS) & (vel >= 0.0)
    done = terminated | (steps >= self.max_episode_steps)

    reward = jnp.full((), -1.0, jnp.float32)
    step_type = jnp.where(done, ts.StepType.LAST, ts.StepType.MID).astype(
        jnp.int32)
    discount = jnp.where(terminated, 0.0, 1.0).astype(jnp.float32)
    new_state = MountainCarState(
        physics=physics, steps=steps, terminated=terminated)
    return new_state, ts.TimeStep(
        step_type=step_type, reward=reward, discount=discount,
        observation=physics)


class ContinuousMountainCar(JaxEnvironment):
  """Continuous-action mountain car; max_episode_steps=999 mirrors v0."""

  def __init__(self, max_episode_steps: int = 999):
    self.max_episode_steps = max_episode_steps

  def observation_spec(self):
    return array_spec.BoundedArraySpec(
        (2,), np.float32,
        minimum=np.array([_C_MIN_POS, -_C_MAX_SPEED], np.float32),
        maximum=np.array([_C_MAX_POS, _C_MAX_SPEED], np.float32),
        name="observation")

  def action_spec(self):
    return array_spec.BoundedArraySpec((1,), np.float32, -1.0, 1.0,
                                       name="action")

  def reset(self, key):
    pos = jax.random.uniform(key, (), jnp.float32, -0.6, -0.4)
    physics = jnp.stack([pos, jnp.zeros((), jnp.float32)])
    state = MountainCarState(
        physics=physics,
        steps=jnp.zeros((), jnp.int32),
        terminated=jnp.zeros((), jnp.bool_))
    return state, ts.restart(physics)

  def step(self, state: MountainCarState, action, key):
    del key
    pos, vel = state.physics[0], state.physics[1]
    force = jnp.clip(action[0], -1.0, 1.0)
    vel = vel + force * _C_POWER - 0.0025 * jnp.cos(3.0 * pos)
    vel = jnp.clip(vel, -_C_MAX_SPEED, _C_MAX_SPEED)
    pos = jnp.clip(pos + vel, _C_MIN_POS, _C_MAX_POS)
    vel = jnp.where((pos <= _C_MIN_POS) & (vel < 0.0), 0.0, vel)
    physics = jnp.stack([pos, vel])

    steps = state.steps + 1
    terminated = (pos >= _C_GOAL_POS) & (vel >= 0.0)
    done = terminated | (steps >= self.max_episode_steps)

    # Penalty uses the RAW action (gymnasium MountainCarContinuous-v0
    # semantics): out-of-bounds actions are clipped for the dynamics but
    # still pay their full quadratic cost.
    reward = jnp.where(terminated, 100.0, 0.0) - 0.1 * action[0] ** 2
    step_type = jnp.where(done, ts.StepType.LAST, ts.StepType.MID).astype(
        jnp.int32)
    discount = jnp.where(terminated, 0.0, 1.0).astype(jnp.float32)
    new_state = MountainCarState(
        physics=physics, steps=steps, terminated=terminated)
    return new_state, ts.TimeStep(
        step_type=step_type, reward=reward.astype(jnp.float32),
        discount=discount, observation=physics)
