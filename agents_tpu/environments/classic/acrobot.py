"""Acrobot as a pure-JAX environment.

Dynamics match Gym's classic ``Acrobot-v1`` (Sutton's acrobot with the
book's dynamics, RK4 integration), reached in the reference through
``suite_gym.load`` (tf_agents/environments/suite_gym.py:45). Jitted and
vmapped for lockstep on-device stepping.

Observation is the 6-dim trig encoding
``[cos(t1), sin(t1), cos(t2), sin(t2), t1_dot, t2_dot]``.
Termination (free end above the bar) emits LAST with discount 0.0;
time-limit truncation emits LAST with discount 1.0.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from agents_tpu.environments.jax_environment import JaxEnvironment
from agents_tpu.specs import array_spec
from agents_tpu.trajectories import time_step as ts

_DT = 0.2
_L1 = 1.0
_M1 = 1.0
_M2 = 1.0
_LC1 = 0.5
_LC2 = 0.5
_I1 = 1.0
_I2 = 1.0
_G = 9.8
_MAX_VEL_1 = 4 * np.pi
_MAX_VEL_2 = 9 * np.pi


@struct.dataclass
class AcrobotState:
  physics: jax.Array     # [4]: theta1, theta2, dtheta1, dtheta2
  steps: jax.Array       # int32 scalar
  terminated: jax.Array  # bool scalar


def _wrap(x, lo, hi):
  return lo + jnp.mod(x - lo, hi - lo)


def _dsdt(s_aug):
  theta1, theta2, dtheta1, dtheta2, a = (s_aug[0], s_aug[1], s_aug[2],
                                         s_aug[3], s_aug[4])
  d1 = (_M1 * _LC1**2 + _M2 *
        (_L1**2 + _LC2**2 + 2 * _L1 * _LC2 * jnp.cos(theta2)) + _I1 + _I2)
  d2 = _M2 * (_LC2**2 + _L1 * _LC2 * jnp.cos(theta2)) + _I2
  phi2 = _M2 * _LC2 * _G * jnp.cos(theta1 + theta2 - np.pi / 2.0)
  phi1 = (-_M2 * _L1 * _LC2 * dtheta2**2 * jnp.sin(theta2)
          - 2 * _M2 * _L1 * _LC2 * dtheta2 * dtheta1 * jnp.sin(theta2)
          + (_M1 * _LC1 + _M2 * _L1) * _G * jnp.cos(theta1 - np.pi / 2.0)
          + phi2)
  # "Book" dynamics (gym's default book_or_nips='book').
  ddtheta2 = ((a + d2 / d1 * phi1
               - _M2 * _L1 * _LC2 * dtheta1**2 * jnp.sin(theta2) - phi2)
              / (_M2 * _LC2**2 + _I2 - d2**2 / d1))
  ddtheta1 = -(d2 * ddtheta2 + phi1) / d1
  return jnp.stack([dtheta1, dtheta2, ddtheta1, ddtheta2,
                    jnp.zeros_like(a)])


def _rk4_step(s_aug, dt):
  k1 = _dsdt(s_aug)
  k2 = _dsdt(s_aug + dt / 2 * k1)
  k3 = _dsdt(s_aug + dt / 2 * k2)
  k4 = _dsdt(s_aug + dt * k3)
  return s_aug + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)


class Acrobot(JaxEnvironment):
  """max_episode_steps=500 mirrors Acrobot-v1."""

  def __init__(self, max_episode_steps: int = 500):
    self.max_episode_steps = max_episode_steps

  def observation_spec(self):
    high = np.array([1.0, 1.0, 1.0, 1.0, _MAX_VEL_1, _MAX_VEL_2],
                    np.float32)
    return array_spec.BoundedArraySpec((6,), np.float32, minimum=-high,
                                       maximum=high, name="observation")

  def action_spec(self):
    return array_spec.BoundedArraySpec((), np.int32, 0, 2, name="action")

  def _obs(self, physics):
    t1, t2 = physics[0], physics[1]
    return jnp.stack([jnp.cos(t1), jnp.sin(t1), jnp.cos(t2), jnp.sin(t2),
                      physics[2], physics[3]])

  def reset(self, key):
    physics = jax.random.uniform(key, (4,), jnp.float32, -0.1, 0.1)
    state = AcrobotState(
        physics=physics,
        steps=jnp.zeros((), jnp.int32),
        terminated=jnp.zeros((), jnp.bool_))
    return state, ts.restart(self._obs(physics))

  def step(self, state: AcrobotState, action, key):
    del key  # gym adds torque noise only when torque_noise_max > 0
    torque = action.astype(jnp.float32) - 1.0
    s_aug = jnp.concatenate([state.physics, torque[None]])
    ns = _rk4_step(s_aug, _DT)
    theta1 = _wrap(ns[0], -np.pi, np.pi)
    theta2 = _wrap(ns[1], -np.pi, np.pi)
    dtheta1 = jnp.clip(ns[2], -_MAX_VEL_1, _MAX_VEL_1)
    dtheta2 = jnp.clip(ns[3], -_MAX_VEL_2, _MAX_VEL_2)
    physics = jnp.stack([theta1, theta2, dtheta1, dtheta2])

    steps = state.steps + 1
    terminated = (-jnp.cos(theta1) - jnp.cos(theta2 + theta1)) > 1.0
    done = terminated | (steps >= self.max_episode_steps)

    reward = jnp.where(terminated, 0.0, -1.0).astype(jnp.float32)
    step_type = jnp.where(done, ts.StepType.LAST, ts.StepType.MID).astype(
        jnp.int32)
    discount = jnp.where(terminated, 0.0, 1.0).astype(jnp.float32)
    new_state = AcrobotState(
        physics=physics, steps=steps, terminated=terminated)
    return new_state, ts.TimeStep(
        step_type=step_type, reward=reward, discount=discount,
        observation=self._obs(physics))
