"""Environment validation (reference environments/utils.py
validate_py_environment)."""
from __future__ import annotations

import numpy as np

from agents_tpu.environments.py_environment import PyEnvironment
from agents_tpu.specs import array_spec
from agents_tpu.trajectories import time_step as ts


def validate_py_environment(environment: PyEnvironment, episodes: int = 5,
                            seed: int = 0):
  """Steps random actions and checks every time step against the specs."""
  rng = np.random.RandomState(seed)
  time_step_spec = environment.time_step_spec()
  action_spec = environment.action_spec()
  batch_size = environment.batch_size if environment.batched else None

  def _sample_action():
    def _one(s):
      if np.issubdtype(s.dtype, np.integer):
        lo = np.asarray(s.minimum) if isinstance(
            s, array_spec.BoundedArraySpec) else 0
        hi = np.asarray(s.maximum) if isinstance(
            s, array_spec.BoundedArraySpec) else 1
        out = rng.randint(lo, np.asarray(hi, np.int64) + 1, size=s.shape)
      else:
        lo = np.maximum(np.asarray(s.minimum, np.float64), -1e6)
        hi = np.minimum(np.asarray(s.maximum, np.float64), 1e6)
        out = rng.uniform(lo, hi, size=s.shape)
      out = np.asarray(out, s.dtype)
      if batch_size:
        out = np.stack([out] * batch_size)
      return out

    return array_spec.map_spec_nest(_one, action_spec)

  def _check(time_step):
    import jax
    leaves = jax.tree_util.tree_leaves(time_step.observation)
    spec_leaves = jax.tree_util.tree_leaves(
        time_step_spec.observation,
        is_leaf=lambda s: isinstance(s, array_spec.ArraySpec))
    for leaf, spec in zip(leaves, spec_leaves):
      expected = ((batch_size,) if batch_size else ()) + spec.shape
      if tuple(np.shape(leaf)) != expected:
        raise ValueError(
            f"Observation shape {np.shape(leaf)} != spec {expected}")
      if np.dtype(np.asarray(leaf).dtype) != spec.dtype:
        raise ValueError(
            f"Observation dtype {np.asarray(leaf).dtype} != {spec.dtype}")

  episode_count = 0
  time_step = environment.reset()
  _check(time_step)
  while episode_count < episodes:
    time_step = environment.step(_sample_action())
    _check(time_step)
    if np.all(time_step.step_type == ts.StepType.LAST):
      episode_count += 1
  return True
