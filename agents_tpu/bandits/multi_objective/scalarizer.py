"""Multi-objective scalarizers.

Analogue of ``tf_agents/bandits/multi_objective/
multi_objective_scalarizer.py``: Scalarizer ABC (:103), LinearScalarizer
(:210), ChebyshevScalarizer (:265), HyperVolumeScalarizer (:333).
All operate on [..., num_objectives] arrays.
"""
from __future__ import annotations

import abc
from typing import Sequence

import jax.numpy as jnp
import numpy as np


class Scalarizer(abc.ABC):

  def __init__(self, num_of_objectives: int):
    if num_of_objectives < 2:
      raise ValueError("Need at least 2 objectives")
    self._num_of_objectives = num_of_objectives

  @property
  def num_of_objectives(self):
    return self._num_of_objectives

  def __call__(self, multi_objectives):
    if multi_objectives.shape[-1] != self._num_of_objectives:
      raise ValueError(
          f"Expected {self._num_of_objectives} objectives, got "
          f"{multi_objectives.shape[-1]}")
    return self._scalarize(multi_objectives)

  @abc.abstractmethod
  def _scalarize(self, multi_objectives):
    ...


class LinearScalarizer(Scalarizer):
  """Weighted sum (reference :210)."""

  def __init__(self, weights: Sequence[float]):
    super().__init__(len(weights))
    self._weights = jnp.asarray(weights, jnp.float32)

  def _scalarize(self, m):
    return jnp.sum(m * self._weights, axis=-1)


class ChebyshevScalarizer(Scalarizer):
  """min_i w_i (m_i - ref_i) (reference :265)."""

  def __init__(self, weights: Sequence[float],
               reference_point: Sequence[float]):
    if len(weights) != len(reference_point):
      raise ValueError("weights and reference_point must match")
    super().__init__(len(weights))
    self._weights = jnp.asarray(weights, jnp.float32)
    self._ref = jnp.asarray(reference_point, jnp.float32)

  def _scalarize(self, m):
    return jnp.min(self._weights * (m - self._ref), axis=-1)


class HyperVolumeScalarizer(Scalarizer):
  """min_i max(m_i - slope_i*ref, 0)/dir_i along a direction
  (reference :333, simplified to the same min-ratio form:
  min_i (max(m_i, 0) / direction_i))."""

  ALMOST_ZERO = 1e-6

  def __init__(self, direction: Sequence[float],
               transform_params=None):
    super().__init__(len(direction))
    d = np.asarray(direction, np.float64)
    norm = np.linalg.norm(d)
    if norm < self.ALMOST_ZERO:
      raise ValueError("direction must be nonzero")
    if np.any(d < 0):
      raise ValueError("direction must be non-negative")
    self._direction = jnp.asarray(
        np.maximum(d / norm, self.ALMOST_ZERO), jnp.float32)

  def _scalarize(self, m):
    return jnp.min(jnp.maximum(m, 0.0) / self._direction, axis=-1)
