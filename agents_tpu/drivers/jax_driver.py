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


class JaxEpisodeDriver:
  """Jitted run-until-N-episodes: the DynamicEpisodeDriver analogue.

  Replaces ``tf_agents/drivers/dynamic_episode_driver.py:45`` (a
  tf.while_loop with per-batch-index episode counters) with a
  `lax.while_loop` over lockstep batch steps, counting exactly
  `num_episodes` completed episodes across the batch.

  Exactness via per-row masking: episode quotas are distributed over the
  batch rows (row i gets ``num_episodes // B`` episodes plus one of the
  remainder), and once a row has filled its quota its frames are rewritten
  as boundary frames with zero reward before reaching observers —
  is_boundary() frames are invisible to every standard metric
  (EnvironmentSteps skips boundaries, return/length metrics neither
  accumulate nor push on them), so metrics see exactly `num_episodes`
  episodes, unlike the reference driver which can overshoot by up to B-1
  episodes in its final iteration (dynamic_episode_driver.py:158-176).

  `num_episodes` must be >= batch_size or a multiple won't matter —
  any positive count works; rows beyond the remainder simply get the
  smaller quota. `max_steps` bounds the while_loop (a safety net against
  never-terminating envs); static so the program shape is fixed.
  """

  def __init__(self, env: BatchedJaxEnv, policy,
               observers: Sequence[Callable] = ()):
    self.env = env
    self.policy = policy
    self.observers = tuple(observers)

  def init(self, key) -> DriverState:
    env_state, time_step = self.env.reset(key)
    policy_state = self.policy.init_state(self.env.batch_size)
    return DriverState(env_state=env_state, time_step=time_step,
                       policy_state=policy_state)

  def _quotas(self, num_episodes: int) -> jnp.ndarray:
    b = self.env.batch_size
    base, rem = divmod(num_episodes, b)
    return base + (jnp.arange(b) < rem).astype(jnp.int32)

  def run(self, params, state: DriverState, observer_states, key,
          num_episodes: int, max_steps: int = 10_000):
    """Returns (state, observer_states, steps_taken, episodes_completed).

    `episodes_completed < num_episodes` means the `max_steps` safety net
    fired before every row filled its quota (e.g. a non-terminating env)
    — callers should surface that instead of silently reporting an
    N-episode average over fewer episodes."""
    quotas = self._quotas(num_episodes)

    def _mask_frame(frame: tj.Trajectory, valid):
      """Rewrite dead rows as boundary frames invisible to metrics."""
      def bcast(mask, x):
        return jnp.reshape(mask, mask.shape + (1,) * (x.ndim - mask.ndim))

      step_type = jnp.where(valid, frame.step_type, ts.StepType.LAST)
      next_step_type = jnp.where(valid, frame.next_step_type,
                                 ts.StepType.MID)
      reward = jax.tree_util.tree_map(
          lambda r: jnp.where(bcast(valid, r), r, jnp.zeros_like(r)),
          frame.reward)
      discount = jnp.where(valid, frame.discount,
                           jnp.zeros_like(frame.discount))
      return frame.replace(step_type=step_type,
                           next_step_type=next_step_type,
                           reward=reward, discount=discount)

    def cond(carry):
      _, _, completed, steps, _ = carry
      return jnp.logical_and(jnp.any(completed < quotas),
                             steps < max_steps)

    def body(carry):
      dstate, obs_states, completed, steps, k = carry
      k, k_pol, k_env = jax.random.split(k, 3)
      action_step = self.policy.action(
          params, dstate.time_step, dstate.policy_state, k_pol)
      env_state, next_time_step = self.env.step(
          dstate.env_state, dstate.time_step, action_step.action, k_env)
      frame = tj.from_transition(dstate.time_step, action_step,
                                 next_time_step)
      valid = completed < quotas
      masked = _mask_frame(frame, valid)
      new_obs_states = tuple(
          obs(s, masked) for obs, s in zip(self.observers, obs_states))
      completed = completed + (
          jnp.logical_and(frame.is_last(), valid)).astype(jnp.int32)
      new_dstate = DriverState(env_state=env_state,
                               time_step=next_time_step,
                               policy_state=action_step.state)
      return (new_dstate, new_obs_states, completed, steps + 1, k)

    completed0 = jnp.zeros((self.env.batch_size,), jnp.int32)
    carry = (state, tuple(observer_states), completed0,
             jnp.zeros((), jnp.int32), key)
    state, observer_states, completed, steps, _ = jax.lax.while_loop(
        cond, body, carry)
    episodes_completed = jnp.sum(jnp.minimum(completed, quotas))
    return state, observer_states, steps, episodes_completed
