"""Jitted rollout collection: the DynamicStepDriver analogue.

Replaces ``tf_agents/drivers/dynamic_step_driver.py:48`` (a tf.while_loop
crossing into Python per env step via numpy_function) with a fused
`lax.scan`: policy action, env step, trajectory construction, replay
insertion, and metric updates all execute inside one XLA program per
`run` call.

Observers are pure reducers ``(observer_state, trajectory_frame) ->
observer_state`` — replay buffers and metrics plug in directly:
    JaxDriver(env, policy, observers=[replay.add_batch, metric.update])
Boundary frames (LAST -> FIRST after auto-reset) ARE emitted to observers,
matching reference driver semantics (dynamic_step_driver.py:138-167).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from agents_tpu.environments.jax_environment import BatchedJaxEnv
from agents_tpu.trajectories import policy_step as ps
from agents_tpu.trajectories import time_step as ts
from agents_tpu.trajectories import trajectory as tj


@struct.dataclass
class DriverState:
  env_state: Any
  time_step: ts.TimeStep
  policy_state: Any


class JaxDriver:
  """Collects `num_steps` lockstep frames per `run`.

  Unlike the reference driver, `num_steps` counts scan iterations (each
  emits exactly one frame per env row, boundary frames included); the
  EnvironmentSteps metric reports the reference's "valid steps" count.
  """

  def __init__(self, env: BatchedJaxEnv, policy,
               observers: Sequence[Callable] = (),
               return_trajectories: bool = False):
    self.env = env
    self.policy = policy
    self.observers = tuple(observers)
    self.return_trajectories = return_trajectories

  def init(self, key) -> DriverState:
    k_env = key
    env_state, time_step = self.env.reset(k_env)
    policy_state = self.policy.init_state(self.env.batch_size)
    return DriverState(env_state=env_state, time_step=time_step,
                       policy_state=policy_state)

  def run(self, params, state: DriverState, observer_states, key,
          num_steps: int):
    """Returns (state, observer_states[, trajectories])."""

    def body(carry, step_key):
      dstate, obs_states = carry
      k_pol, k_env = jax.random.split(step_key)
      action_step = self.policy.action(
          params, dstate.time_step, dstate.policy_state, k_pol)
      env_state, next_time_step = self.env.step(
          dstate.env_state, dstate.time_step, action_step.action, k_env)
      frame = tj.from_transition(dstate.time_step, action_step,
                                 next_time_step)
      new_obs_states = tuple(
          obs(s, frame) for obs, s in zip(self.observers, obs_states))
      new_dstate = DriverState(env_state=env_state,
                               time_step=next_time_step,
                               policy_state=action_step.state)
      out = frame if self.return_trajectories else ()
      return (new_dstate, new_obs_states), out

    keys = jax.random.split(key, num_steps)
    (state, observer_states), frames = jax.lax.scan(
        body, (state, tuple(observer_states)), keys)
    if self.return_trajectories:
      return state, observer_states, frames
    return state, observer_states
