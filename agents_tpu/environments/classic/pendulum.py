"""Pendulum swing-up as a pure-JAX environment (Gym ``Pendulum-v1`` dynamics).

Continuous-action fixture for DDPG/TD3/SAC smoke tests, replacing MuJoCo in
unit tests the way the reference uses small deterministic envs
(SURVEY.md §4).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from agents_tpu.environments.jax_environment import JaxEnvironment
from agents_tpu.specs import array_spec
from agents_tpu.trajectories import time_step as ts

_MAX_SPEED = 8.0
_MAX_TORQUE = 2.0
_DT = 0.05
_G = 10.0
_M = 1.0
_L = 1.0


@struct.dataclass
class PendulumState:
  theta: jax.Array
  theta_dot: jax.Array
  steps: jax.Array


def _angle_normalize(x):
  return ((x + jnp.pi) % (2 * jnp.pi)) - jnp.pi


class Pendulum(JaxEnvironment):

  def __init__(self, max_episode_steps: int = 200):
    self.max_episode_steps = max_episode_steps

  def observation_spec(self):
    return array_spec.BoundedArraySpec(
        (3,), np.float32,
        minimum=np.array([-1.0, -1.0, -_MAX_SPEED], np.float32),
        maximum=np.array([1.0, 1.0, _MAX_SPEED], np.float32),
        name="observation")

  def action_spec(self):
    return array_spec.BoundedArraySpec(
        (1,), np.float32, -_MAX_TORQUE, _MAX_TORQUE, name="action")

  def _obs(self, theta, theta_dot):
    return jnp.stack(
        [jnp.cos(theta), jnp.sin(theta), theta_dot]).astype(jnp.float32)

  def reset(self, key):
    k1, k2 = jax.random.split(key)
    theta = jax.random.uniform(k1, (), jnp.float32, -jnp.pi, jnp.pi)
    theta_dot = jax.random.uniform(k2, (), jnp.float32, -1.0, 1.0)
    state = PendulumState(theta=theta, theta_dot=theta_dot,
                          steps=jnp.zeros((), jnp.int32))
    return state, ts.restart(self._obs(theta, theta_dot))

  def step(self, state: PendulumState, action, key):
    del key
    u = jnp.clip(action[0], -_MAX_TORQUE, _MAX_TORQUE)
    th, thdot = state.theta, state.theta_dot
    cost = (_angle_normalize(th)**2 + 0.1 * thdot**2 + 0.001 * u**2)
    newthdot = thdot + (3 * _G / (2 * _L) * jnp.sin(th)
                        + 3.0 / (_M * _L**2) * u) * _DT
    newthdot = jnp.clip(newthdot, -_MAX_SPEED, _MAX_SPEED)
    newth = th + newthdot * _DT
    steps = state.steps + 1
    truncated = steps >= self.max_episode_steps
    step_type = jnp.where(truncated, ts.StepType.LAST,
                          ts.StepType.MID).astype(jnp.int32)
    new_state = PendulumState(theta=newth, theta_dot=newthdot, steps=steps)
    return new_state, ts.TimeStep(
        step_type=step_type,
        reward=(-cost).astype(jnp.float32),
        discount=jnp.ones((), jnp.float32),
        observation=self._obs(newth, newthdot))
