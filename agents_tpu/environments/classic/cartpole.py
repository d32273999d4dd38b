"""CartPole as a pure-JAX environment.

Dynamics match Gym's classic ``CartPole-v0/v1`` (Barto-Sutton-Anderson
cart-pole), which the reference's BASELINE config trains on via
``suite_gym.load('CartPole-v0')`` (tf_agents/agents/dqn/examples/v2/
train_eval.py:94). Here the env itself is jitted and vmapped so thousands
of instances step in lockstep on-device.

Time-limit truncation emits LAST with discount 1.0 (the reference's
TimeLimit wrapper semantics, environments/wrappers.py:99); pole-fall
termination emits LAST with discount 0.0.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from agents_tpu.environments.jax_environment import JaxEnvironment
from agents_tpu.specs import array_spec
from agents_tpu.trajectories import time_step as ts

_GRAVITY = 9.8
_MASS_CART = 1.0
_MASS_POLE = 0.1
_TOTAL_MASS = _MASS_CART + _MASS_POLE
_LENGTH = 0.5  # half pole length
_POLEMASS_LENGTH = _MASS_POLE * _LENGTH
_FORCE_MAG = 10.0
_TAU = 0.02
_THETA_THRESHOLD = 12 * 2 * math.pi / 360
_X_THRESHOLD = 2.4


@struct.dataclass
class CartPoleState:
  physics: jax.Array  # [4]: x, x_dot, theta, theta_dot
  steps: jax.Array    # int32 scalar
  terminated: jax.Array  # bool scalar: pole fell / out of bounds last step


class CartPole(JaxEnvironment):
  """max_episode_steps=200 mirrors CartPole-v0; pass 500 for v1."""

  def __init__(self, max_episode_steps: int = 200):
    self.max_episode_steps = max_episode_steps

  def observation_spec(self):
    return array_spec.BoundedArraySpec(
        (4,), np.float32,
        minimum=np.array([-4.8, np.finfo(np.float32).min, -0.418,
                          np.finfo(np.float32).min], np.float32),
        maximum=np.array([4.8, np.finfo(np.float32).max, 0.418,
                          np.finfo(np.float32).max], np.float32),
        name="observation")

  def action_spec(self):
    return array_spec.BoundedArraySpec((), np.int32, 0, 1, name="action")

  def reset(self, key):
    physics = jax.random.uniform(key, (4,), jnp.float32, -0.05, 0.05)
    state = CartPoleState(
        physics=physics,
        steps=jnp.zeros((), jnp.int32),
        terminated=jnp.zeros((), jnp.bool_),
    )
    return state, ts.restart(physics)

  def step(self, state: CartPoleState, action, key):
    del key  # deterministic dynamics
    x, x_dot, theta, theta_dot = (state.physics[0], state.physics[1],
                                  state.physics[2], state.physics[3])
    force = jnp.where(action == 1, _FORCE_MAG, -_FORCE_MAG)
    costheta = jnp.cos(theta)
    sintheta = jnp.sin(theta)
    temp = (force + _POLEMASS_LENGTH * theta_dot**2 * sintheta) / _TOTAL_MASS
    thetaacc = (_GRAVITY * sintheta - costheta * temp) / (
        _LENGTH * (4.0 / 3.0 - _MASS_POLE * costheta**2 / _TOTAL_MASS))
    xacc = temp - _POLEMASS_LENGTH * thetaacc * costheta / _TOTAL_MASS

    x = x + _TAU * x_dot
    x_dot = x_dot + _TAU * xacc
    theta = theta + _TAU * theta_dot
    theta_dot = theta_dot + _TAU * thetaacc
    physics = jnp.stack([x, x_dot, theta, theta_dot])

    steps = state.steps + 1
    terminated = ((jnp.abs(x) > _X_THRESHOLD)
                  | (jnp.abs(theta) > _THETA_THRESHOLD))
    truncated = steps >= self.max_episode_steps
    done = terminated | truncated

    reward = jnp.ones((), jnp.float32)
    step_type = jnp.where(done, ts.StepType.LAST, ts.StepType.MID).astype(
        jnp.int32)
    discount = jnp.where(terminated, 0.0, 1.0).astype(jnp.float32)
    new_state = CartPoleState(
        physics=physics, steps=steps, terminated=terminated)
    return new_state, ts.TimeStep(
        step_type=step_type, reward=reward, discount=discount,
        observation=physics)
