"""Trajectory / Transition pytrees and their conversion algebra.

TPU-native analogue of ``tf_agents/trajectories/trajectory.py``:
  - ``Trajectory`` (reference :36-48): 7 fields
    (step_type, observation, action, policy_info, next_step_type, reward,
    discount)
  - ``Transition`` (reference :128): (time_step, action_step, next_time_step)
  - ``from_transition`` (:614) / ``to_transition`` (:650) /
    ``to_n_step_transition`` (:716) / ``from_episode`` (:491)
  - boundary/first/mid/last factories (:262-466) and predicates.

All functions are pure, jit-safe, and operate on pytrees.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from agents_tpu.specs import array_spec
from agents_tpu.trajectories import policy_step as ps
from agents_tpu.trajectories import time_step as ts


@struct.dataclass
class Trajectory:
  """One (batched/time-stacked) frame of experience (reference :36-48).

  ``reward``/``discount``/``next_step_type`` at index ``t`` describe the
  *result* of taking ``action[t]`` from ``observation[t]``.
  """
  step_type: Any
  observation: Any
  action: Any
  policy_info: Any
  next_step_type: Any
  reward: Any
  discount: Any

  def is_first(self):
    return self.step_type == ts.StepType.FIRST

  def is_mid(self):
    return jnp.logical_and(self.step_type == ts.StepType.MID,
                           self.next_step_type == ts.StepType.MID)

  def is_last(self):
    return self.next_step_type == ts.StepType.LAST

  def is_boundary(self):
    return self.step_type == ts.StepType.LAST

  def replace_fields(self, **kwargs) -> "Trajectory":
    return self.replace(**kwargs)


@struct.dataclass
class Transition:
  """(time_step, action_step, next_time_step) (reference :128)."""
  time_step: ts.TimeStep
  action_step: ps.PolicyStep
  next_time_step: ts.TimeStep


# ---------------------------------------------------------------------------
# Factories
# ---------------------------------------------------------------------------

def _create_trajectory(observation, action, policy_info, reward, discount,
                       step_type, next_step_type) -> Trajectory:
  discount = jnp.asarray(discount, jnp.float32)
  shape = discount.shape
  as_arrays = lambda nest: jax.tree_util.tree_map(jnp.asarray, nest)
  return Trajectory(
      step_type=jnp.full(shape, step_type, dtype=jnp.int32),
      observation=as_arrays(observation),
      action=as_arrays(action),
      policy_info=as_arrays(policy_info),
      next_step_type=jnp.full(shape, next_step_type, dtype=jnp.int32),
      reward=as_arrays(reward),
      discount=discount,
  )


def first(observation, action, policy_info, reward, discount) -> Trajectory:
  """FIRST -> MID frame (reference :341)."""
  return _create_trajectory(observation, action, policy_info, reward, discount,
                            ts.StepType.FIRST, ts.StepType.MID)


def mid(observation, action, policy_info, reward, discount) -> Trajectory:
  """MID -> MID frame (reference :389)."""
  return _create_trajectory(observation, action, policy_info, reward, discount,
                            ts.StepType.MID, ts.StepType.MID)


def last(observation, action, policy_info, reward, discount) -> Trajectory:
  """MID -> LAST frame (reference :437)."""
  return _create_trajectory(observation, action, policy_info, reward, discount,
                            ts.StepType.MID, ts.StepType.LAST)


def boundary(observation, action, policy_info, reward, discount) -> Trajectory:
  """LAST -> FIRST frame: the episode boundary (reference :262)."""
  return _create_trajectory(observation, action, policy_info, reward, discount,
                            ts.StepType.LAST, ts.StepType.FIRST)


def single_step(observation, action, policy_info, reward,
                discount) -> Trajectory:
  """FIRST -> LAST frame (length-1 bandit episode; reference :295)."""
  return _create_trajectory(observation, action, policy_info, reward, discount,
                            ts.StepType.FIRST, ts.StepType.LAST)


def from_episode(observation, action, policy_info, reward,
                 discount=None) -> Trajectory:
  """Build a time-major Trajectory from full-episode arrays (reference :491).

  All inputs shaped ``[T, ...]``. ``step_type`` is FIRST then MID;
  ``next_step_type`` is MID then LAST at the final frame.
  """
  reward = jax.tree_util.tree_map(jnp.asarray, reward)
  num_frames = jnp.shape(jax.tree_util.tree_leaves(reward)[0])[0]
  if discount is None:
    discount = jnp.ones((num_frames,), jnp.float32)
  else:
    discount = jnp.asarray(discount, jnp.float32)
  time_ix = jnp.arange(num_frames)
  step_type = jnp.where(time_ix == 0, ts.StepType.FIRST,
                        ts.StepType.MID).astype(jnp.int32)
  next_step_type = jnp.where(time_ix == num_frames - 1, ts.StepType.LAST,
                             ts.StepType.MID).astype(jnp.int32)
  return Trajectory(
      step_type=step_type,
      observation=jax.tree_util.tree_map(jnp.asarray, observation),
      action=jax.tree_util.tree_map(jnp.asarray, action),
      policy_info=jax.tree_util.tree_map(jnp.asarray, policy_info),
      next_step_type=next_step_type,
      reward=reward,
      discount=discount,
  )


# ---------------------------------------------------------------------------
# Conversions
# ---------------------------------------------------------------------------

def from_transition(time_step: ts.TimeStep, action_step: ps.PolicyStep,
                    next_time_step: ts.TimeStep) -> Trajectory:
  """Trajectory frame from a transition (reference :614-648)."""
  return Trajectory(
      step_type=time_step.step_type,
      observation=time_step.observation,
      action=action_step.action,
      policy_info=action_step.info,
      next_step_type=next_time_step.step_type,
      reward=next_time_step.reward,
      discount=next_time_step.discount,
  )


def to_transition(trajectory: Trajectory,
                  next_trajectory: Optional[Trajectory] = None) -> Transition:
  """Transition(s) from adjacent trajectory frames (reference :650-714).

  If `next_trajectory` is None, `trajectory` must be shaped ``[B, T, ...]``
  and is sliced along time: outputs have T-1 steps. The `time_step.reward`
  and `.discount` are zero-filled (undefined, matching the reference).
  """
  if next_trajectory is None:
    next_trajectory = jax.tree_util.tree_map(lambda t: t[:, 1:], trajectory)
    trajectory = jax.tree_util.tree_map(lambda t: t[:, :-1], trajectory)
  policy_steps = ps.PolicyStep(
      action=trajectory.action, state=(), info=trajectory.policy_info)
  time_steps = ts.TimeStep(
      step_type=trajectory.step_type,
      reward=jax.tree_util.tree_map(jnp.zeros_like, trajectory.reward),
      discount=jnp.zeros_like(trajectory.discount),
      observation=trajectory.observation,
  )
  next_time_steps = ts.TimeStep(
      step_type=trajectory.next_step_type,
      reward=trajectory.reward,
      discount=trajectory.discount,
      observation=next_trajectory.observation,
  )
  return Transition(time_steps, policy_steps, next_time_steps)


def to_n_step_transition(trajectory: Trajectory, gamma) -> Transition:
  """N-step transition from a ``[B, T=N+1]`` trajectory (reference :716-850).

  next_time_step.reward  = sum_{n<N} gamma^n * prod_{m<n} d_m * r_n
  next_time_step.discount = gamma^{N-1} * prod_{n<N} d_n
  """
  discount_bt = trajectory.discount
  if discount_bt.ndim != 2:
    raise ValueError(
        f"to_n_step_transition requires [B, T] discount; got {discount_bt.shape}")
  time_dim = discount_bt.shape[1]
  if time_dim < 2:
    raise ValueError(f"Trajectory frame count must be >= 2, saw {time_dim}")
  n = time_dim - 1

  first_frame = jax.tree_util.tree_map(lambda t: t[:, 0], trajectory)
  final_frame = jax.tree_util.tree_map(lambda t: t[:, -1], trajectory)

  reward = trajectory.reward[:, :-1]        # [B, N]
  discount = trajectory.discount[:, :-1]    # [B, N]

  # Discounted sum along time with per-step env discounts (closed form via
  # cumulative products; no scan needed for small N).
  g = jnp.asarray(gamma, reward.dtype)
  # cum[n] = prod_{m<n} d_m (exclusive product)
  cum = jnp.concatenate(
      [jnp.ones_like(discount[:, :1]), jnp.cumprod(discount, axis=1)[:, :-1]],
      axis=1)
  powers = g ** jnp.arange(n, dtype=reward.dtype)
  discounted_reward = jnp.sum(reward * powers[None, :] * cum, axis=1)
  final_discount = g ** (n - 1) * jnp.prod(discount, axis=1)

  policy_steps = ps.PolicyStep(
      action=first_frame.action, state=(), info=first_frame.policy_info)
  time_steps = ts.TimeStep(
      step_type=first_frame.step_type,
      reward=jax.tree_util.tree_map(
          lambda r: jnp.full_like(r, jnp.nan), first_frame.reward),
      discount=jnp.full_like(first_frame.discount, jnp.nan),
      observation=first_frame.observation,
  )
  next_time_steps = ts.TimeStep(
      step_type=final_frame.step_type,
      reward=discounted_reward,
      discount=final_discount,
      observation=final_frame.observation,
  )
  return Transition(time_steps, policy_steps, next_time_steps)


# ---------------------------------------------------------------------------
# Specs
# ---------------------------------------------------------------------------

def trajectory_spec(time_step_spec: ts.TimeStep, action_spec,
                    policy_info_spec=()) -> Trajectory:
  """Spec nest matching Trajectory frames (the `collect_data_spec`)."""
  return Trajectory(
      step_type=time_step_spec.step_type,
      observation=time_step_spec.observation,
      action=action_spec,
      policy_info=policy_info_spec,
      next_step_type=time_step_spec.step_type,
      reward=time_step_spec.reward,
      discount=time_step_spec.discount,
  )


def check_adjacent_transition_sequence(experience, agent_name: str):
  """Static guard for agents that train on single adjacent-frame
  transitions (train_sequence_length == 2): to_transition of a longer
  [B, T] window yields T-1 transitions and the [:, 0] squeeze would
  silently discard all but the first — data loss with no error (the
  reference's AsTransition converter raises the same way,
  data_converter.py:377)."""
  shape = jnp.shape(experience.step_type)
  if len(shape) != 2 or shape[1] != 2:
    raise ValueError(
        f"{agent_name} trains on adjacent-frame transitions "
        f"(train_sequence_length=2); got experience with step_type shape "
        f"{shape}. Sample replay with num_steps=2 — a longer window "
        "would be silently truncated to its first transition.")


def to_transition_spec(traj_spec: Trajectory) -> Transition:
  """Transition spec from a trajectory spec (reference :852)."""
  time_step_spec = ts.TimeStep(
      step_type=traj_spec.step_type,
      reward=traj_spec.reward,
      discount=traj_spec.discount,
      observation=traj_spec.observation,
  )
  return Transition(
      time_step=time_step_spec,
      action_step=ps.PolicyStep(action=traj_spec.action, state=(),
                                info=traj_spec.policy_info),
      next_time_step=time_step_spec,
  )
