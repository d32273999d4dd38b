"""TimeStep / StepType: the environment-output data model.

TPU-native analogue of ``tf_agents/trajectories/time_step.py:54,113``.
`TimeStep` is a registered pytree dataclass so it flows through `jit`,
`vmap`, `lax.scan`, and shardings unchanged.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from agents_tpu.specs import array_spec


class StepType:
  """FIRST/MID/LAST markers (reference time_step.py:113)."""
  FIRST = np.int32(0)
  MID = np.int32(1)
  LAST = np.int32(2)


@struct.dataclass
class TimeStep:
  """(step_type, reward, discount, observation) pytree.

  Mirrors reference ``TimeStep`` (time_step.py:54). `reward` and
  `observation` may themselves be pytrees.
  """
  step_type: Any
  reward: Any
  discount: Any
  observation: Any

  def is_first(self):
    return self.step_type == StepType.FIRST

  def is_mid(self):
    return self.step_type == StepType.MID

  def is_last(self):
    return self.step_type == StepType.LAST


def _reward_like(reward_spec, outer_shape, fill=0.0):
  if reward_spec is None:
    return jnp.full(outer_shape, fill, dtype=jnp.float32)
  return array_spec.map_spec_nest(
      lambda s: jnp.full(outer_shape + s.shape, fill, dtype=s.dtype),
      reward_spec)


def restart(observation, batch_size: Optional[int] = None,
            reward_spec=None) -> TimeStep:
  """FIRST step (reference time_step.py:135)."""
  outer = (batch_size,) if batch_size is not None else ()
  step_type = jnp.full(outer, StepType.FIRST, dtype=jnp.int32)
  return TimeStep(
      step_type=step_type,
      reward=_reward_like(reward_spec, outer),
      discount=jnp.ones(outer, dtype=jnp.float32),
      observation=observation,
  )


def transition(observation, reward, discount=1.0,
               outer_dims=None) -> TimeStep:
  """MID step (reference time_step.py:209)."""
  reward = jax.tree_util.tree_map(jnp.asarray, reward)
  if outer_dims is None:
    outer_dims = jnp.shape(jax.tree_util.tree_leaves(reward)[0])
  return TimeStep(
      step_type=jnp.full(outer_dims, StepType.MID, dtype=jnp.int32),
      reward=reward,
      discount=jnp.broadcast_to(
          jnp.asarray(discount, jnp.float32), outer_dims),
      observation=observation,
  )


def termination(observation, reward, outer_dims=None) -> TimeStep:
  """LAST step with zero discount (reference time_step.py:285)."""
  reward = jax.tree_util.tree_map(jnp.asarray, reward)
  if outer_dims is None:
    outer_dims = jnp.shape(jax.tree_util.tree_leaves(reward)[0])
  return TimeStep(
      step_type=jnp.full(outer_dims, StepType.LAST, dtype=jnp.int32),
      reward=reward,
      discount=jnp.zeros(outer_dims, dtype=jnp.float32),
      observation=observation,
  )


def truncation(observation, reward, discount=1.0, outer_dims=None) -> TimeStep:
  """LAST step with non-zero discount (time-limit; reference :349)."""
  reward = jax.tree_util.tree_map(jnp.asarray, reward)
  if outer_dims is None:
    outer_dims = jnp.shape(jax.tree_util.tree_leaves(reward)[0])
  return TimeStep(
      step_type=jnp.full(outer_dims, StepType.LAST, dtype=jnp.int32),
      reward=reward,
      discount=jnp.broadcast_to(
          jnp.asarray(discount, jnp.float32), outer_dims),
      observation=observation,
  )


def time_step_spec(observation_spec, reward_spec=None):
  """Spec nest for TimeSteps given obs/reward specs (reference :415)."""
  if reward_spec is None:
    reward_spec = array_spec.ArraySpec((), np.float32, name="reward")
  return TimeStep(
      step_type=array_spec.ArraySpec((), np.int32, name="step_type"),
      reward=reward_spec,
      discount=array_spec.BoundedArraySpec(
          (), np.float32, minimum=0.0, maximum=1.0, name="discount"),
      observation=observation_spec,
  )
