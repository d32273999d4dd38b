"""Array specs: shape/dtype(/bounds) descriptors for pytree leaves.

TPU-native rework of the reference's two-level spec system
(``tf_agents/specs/array_spec.py:170,271`` and ``specs/tensor_spec.py``).
JAX needs only one level: a spec is a static, hashable description used both
for host numpy arrays and device arrays, so it can be a `jit` static argument
and a pytree *structure* (specs are not traced).

Key surface (reference parity):
  - ``ArraySpec`` / ``BoundedArraySpec``  (array_spec.py:170,271)
  - ``sample_spec_nest``                  (array_spec.py:87, tensor_spec.py:314)
  - ``check_arrays_nest``                 (array_spec.py:114)
  - ``zero_spec_nest``                    (tensor_spec.py:436)
  - ``add_outer_dims_nest`` / outer-dim algebra (tensor_spec.py:472)
"""
from __future__ import annotations

import functools
from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


def _canonical_dtype(dtype) -> np.dtype:
  return np.dtype(dtype)


def _canonical_shape(shape) -> Tuple[int, ...]:
  if shape is None:
    return ()
  return tuple(int(d) for d in shape)


class ArraySpec:
  """Describes a single array leaf: shape, dtype, name.

  Static and hashable — safe to close over in jitted functions and to use as
  dict keys. Mirrors ``tf_agents.specs.ArraySpec`` (array_spec.py:170).
  """

  __slots__ = ("_shape", "_dtype", "_name")

  def __init__(self, shape: Sequence[int], dtype, name: Optional[str] = None):
    self._shape = _canonical_shape(shape)
    self._dtype = _canonical_dtype(dtype)
    self._name = name

  @property
  def shape(self) -> Tuple[int, ...]:
    return self._shape

  @property
  def dtype(self) -> np.dtype:
    return self._dtype

  @property
  def name(self) -> Optional[str]:
    return self._name

  @property
  def ndim(self) -> int:
    return len(self._shape)

  def __repr__(self):
    return (f"{type(self).__name__}(shape={self._shape}, "
            f"dtype={self._dtype.name}, name={self._name!r})")

  def __eq__(self, other):
    if not isinstance(other, ArraySpec) or isinstance(other, BoundedArraySpec):
      return (isinstance(other, ArraySpec)
              and not isinstance(other, BoundedArraySpec)
              and self._shape == other._shape and self._dtype == other._dtype)
    return self._shape == other._shape and self._dtype == other._dtype

  def __ne__(self, other):
    return not self == other

  def __hash__(self):
    return hash((self._shape, self._dtype.str))

  def check_array(self, array) -> bool:
    """True iff `array` conforms to this spec (array_spec.py:219)."""
    if isinstance(array, (np.ndarray, jax.Array)):
      return (tuple(array.shape) == self._shape
              and np.dtype(array.dtype) == self._dtype)
    return False

  def replace(self, shape=None, dtype=None, name=None) -> "ArraySpec":
    return ArraySpec(
        self._shape if shape is None else shape,
        self._dtype if dtype is None else dtype,
        self._name if name is None else name,
    )

  @classmethod
  def from_array(cls, array, name=None) -> "ArraySpec":
    return cls(array.shape, array.dtype, name)


class BoundedArraySpec(ArraySpec):
  """ArraySpec with inclusive `minimum`/`maximum` bounds.

  Mirrors ``tf_agents.specs.BoundedArraySpec`` (array_spec.py:271). Bounds are
  stored as numpy arrays broadcastable to `shape`.
  """

  __slots__ = ("_minimum", "_maximum")

  def __init__(self, shape, dtype, minimum=None, maximum=None,
               name: Optional[str] = None):
    super().__init__(shape, dtype, name)
    if np.issubdtype(self.dtype, np.integer):
      info = np.iinfo(self.dtype)
      lo, hi = info.min, info.max
    elif np.issubdtype(self.dtype, np.floating):
      info = np.finfo(self.dtype)
      lo, hi = info.min, info.max
    else:  # bool etc.
      lo, hi = 0, 1
    minimum = lo if minimum is None else minimum
    maximum = hi if maximum is None else maximum
    self._minimum = np.array(minimum, dtype=self.dtype)
    self._maximum = np.array(maximum, dtype=self.dtype)
    if not np.all(self._minimum <= self._maximum):
      raise ValueError(
          f"Spec minimum {self._minimum} > maximum {self._maximum}")

  @property
  def minimum(self) -> np.ndarray:
    return self._minimum

  @property
  def maximum(self) -> np.ndarray:
    return self._maximum

  @property
  def num_values(self) -> int:
    """Number of discrete values for integer scalar specs (for Categorical)."""
    if not np.issubdtype(self.dtype, np.integer):
      raise ValueError("num_values only defined for integer specs")
    return int(np.max(self._maximum) - np.min(self._minimum) + 1)

  def __repr__(self):
    return (f"BoundedArraySpec(shape={self._shape}, dtype={self._dtype.name}, "
            f"minimum={self._minimum}, maximum={self._maximum}, "
            f"name={self._name!r})")

  def __eq__(self, other):
    return (isinstance(other, BoundedArraySpec)
            and self._shape == other._shape and self._dtype == other._dtype
            and np.array_equal(self._minimum, other._minimum)
            and np.array_equal(self._maximum, other._maximum))

  def __hash__(self):
    return hash((self._shape, self._dtype.str,
                 self._minimum.tobytes(), self._maximum.tobytes()))

  def check_array(self, array) -> bool:
    return (super().check_array(array)
            and bool(np.all(np.asarray(array) >= self._minimum))
            and bool(np.all(np.asarray(array) <= self._maximum)))

  def replace(self, shape=None, dtype=None, minimum=None, maximum=None,
              name=None) -> "BoundedArraySpec":
    return BoundedArraySpec(
        self._shape if shape is None else shape,
        self._dtype if dtype is None else dtype,
        self._minimum if minimum is None else minimum,
        self._maximum if maximum is None else maximum,
        self._name if name is None else name,
    )

  @classmethod
  def from_spec(cls, spec: ArraySpec, name=None) -> "BoundedArraySpec":
    if isinstance(spec, BoundedArraySpec):
      return cls(spec.shape, spec.dtype, spec.minimum, spec.maximum,
                 name or spec.name)
    return cls(spec.shape, spec.dtype, name=name or spec.name)


# ---------------------------------------------------------------------------
# Nest-level algebra. A "nest of specs" is any pytree whose leaves are
# ArraySpec instances (specs are NOT pytree leaves of data trees — helper
# functions here use tree_map with is_leaf on ArraySpec).
# ---------------------------------------------------------------------------

def _is_spec(x) -> bool:
  return isinstance(x, ArraySpec)


def map_spec_nest(fn, *nests):
  return jax.tree_util.tree_map(fn, *nests, is_leaf=_is_spec)


def sample_spec(spec: ArraySpec, key: jax.Array) -> jax.Array:
  """Sample a single array conforming to `spec` (array_spec.py:42-84).

  Bounded specs sample uniformly within bounds; unbounded float specs sample
  standard normal; unbounded int specs sample in [-2^28, 2^28).
  """
  shape = spec.shape
  if isinstance(spec, BoundedArraySpec):
    lo = np.broadcast_to(spec.minimum, shape)
    hi = np.broadcast_to(spec.maximum, shape)
    if np.issubdtype(spec.dtype, np.integer):
      # Exclusive upper bound computed in numpy int64 (static) and
      # clamped: `int32(hi) + 1` overflows for default-bounds specs
      # (maximum = 2^31-1 wraps to INT32_MIN, silently sampling a
      # constant). Bounds beyond int32 range lose their top value only.
      i32 = np.iinfo(np.int32)
      lo64 = np.clip(lo.astype(np.int64), i32.min, i32.max)
      hi64 = np.clip(hi.astype(np.int64) + 1, i32.min, i32.max)
      out = jax.random.randint(
          key, shape, jnp.asarray(lo64, jnp.int32),
          jnp.asarray(hi64, jnp.int32))
      return out.astype(spec.dtype)
    if spec.dtype == np.bool_:
      return jax.random.bernoulli(key, 0.5, shape)
    # Dtype-extreme (unbounded) specs -> standard normal. Checked on the
    # RAW bounds: clipping first made the finfo comparison unreachable
    # for float32/64, so default-bounds specs sampled uniform at ~1e18
    # magnitude (round-5 review).
    finfo = np.finfo(spec.dtype)
    lo_f = lo.astype(np.float64)
    hi_f = hi.astype(np.float64)
    if np.all(lo_f <= float(finfo.min) / 2) and \
        np.all(hi_f >= float(finfo.max) / 2):
      return jax.random.normal(key, shape, dtype=spec.dtype)
    lo_c = np.maximum(lo_f, -1e18)
    hi_c = np.minimum(hi_f, 1e18)
    return jax.random.uniform(
        key, shape, minval=lo_c, maxval=hi_c).astype(spec.dtype)
  if np.issubdtype(spec.dtype, np.integer):
    return jax.random.randint(key, shape, -(2**28), 2**28).astype(spec.dtype)
  if spec.dtype == np.bool_:
    return jax.random.bernoulli(key, 0.5, shape)
  return jax.random.normal(key, shape, dtype=spec.dtype)


def np_sample_spec_nest(specs, rng, outer_dims: Sequence[int] = ()):
  """Numpy twin of sample_spec_nest for host-side warmup collection.

  Integer bounded specs sample uniformly over the INCLUSIVE range
  [minimum, maximum] via randint(lo, hi + 1) — float-uniform + astype
  truncation would never produce the max action and, for a 2-action
  spec, would emit action 0 every time."""
  outer = tuple(outer_dims)

  def _one(s):
    shape = outer + tuple(s.shape)
    if isinstance(s, BoundedArraySpec):
      lo = np.broadcast_to(s.minimum, s.shape)
      hi = np.broadcast_to(s.maximum, s.shape)
      if np.issubdtype(s.dtype, np.integer):
        return rng.randint(np.broadcast_to(lo, shape),
                           np.broadcast_to(hi, shape).astype(np.int64) + 1
                           ).astype(s.dtype)
      if s.dtype == np.bool_:
        return rng.rand(*shape) < 0.5
      # Dtype-extreme (unbounded) float specs -> standard normal, same
      # as the jax twin sample_spec; clipped uniform only for genuinely
      # bounded specs.
      finfo = np.finfo(s.dtype)
      lo_f, hi_f = lo.astype(np.float64), hi.astype(np.float64)
      if np.all(lo_f <= float(finfo.min) / 2) and \
          np.all(hi_f >= float(finfo.max) / 2):
        return rng.standard_normal(shape).astype(s.dtype)
      lo_c = np.maximum(lo_f, -1e6)
      hi_c = np.minimum(hi_f, 1e6)
      return rng.uniform(np.broadcast_to(lo_c, shape),
                         np.broadcast_to(hi_c, shape)).astype(s.dtype)
    if np.issubdtype(s.dtype, np.integer):
      return rng.randint(-(2**28), 2**28, size=shape).astype(s.dtype)
    if s.dtype == np.bool_:
      return rng.rand(*shape) < 0.5
    return rng.standard_normal(shape).astype(s.dtype)

  return map_spec_nest(_one, specs)


def sample_spec_nest(specs, key: jax.Array, outer_dims: Sequence[int] = ()):
  """Sample a nest of arrays conforming to a nest of specs.

  Mirrors ``array_spec.sample_spec_nest`` (:87) / ``tensor_spec.sample_spec_nest``
  (:314) with explicit RNG-key threading.
  """
  leaves, treedef = jax.tree_util.tree_flatten(specs, is_leaf=_is_spec)
  keys = jax.random.split(key, max(len(leaves), 1))
  outer = tuple(outer_dims)
  samples = [
      sample_spec(s.replace(shape=outer + s.shape), k)
      for s, k in zip(leaves, keys)
  ]
  return jax.tree_util.tree_unflatten(treedef, samples)


def zero_spec_nest(specs, outer_dims: Sequence[int] = ()):
  """Zero-valued nest conforming to specs (tensor_spec.py:436)."""
  outer = tuple(outer_dims)
  return map_spec_nest(
      lambda s: jnp.zeros(outer + s.shape, dtype=s.dtype), specs)


def check_arrays_nest(arrays, specs) -> bool:
  """True iff `arrays` conforms to `specs` — STRUCTURE and leaf-wise
  shape/dtype (array_spec.py:114; the reference asserts same structure,
  so a dict with wrong keys must fail even when flattened leaves happen
  to line up)."""
  try:
    spec_leaves, spec_def = jax.tree_util.tree_flatten(specs, is_leaf=_is_spec)
    arr_leaves, arr_def = jax.tree_util.tree_flatten(arrays)
  except Exception:
    return False
  if len(spec_leaves) != len(arr_leaves):
    return False
  if spec_def != arr_def:
    # Structures must match, modulo specs being leaves: re-flatten the
    # spec nest without the is_leaf override for a like-for-like treedef
    # (a spec "leaf" that is itself a container would differ spuriously).
    try:
      plain_def = jax.tree_util.tree_structure(
          jax.tree_util.tree_unflatten(spec_def, [0] * len(spec_leaves)))
    except Exception:
      return False
    if plain_def != arr_def:
      return False
  return all(s.check_array(a) for s, a in zip(spec_leaves, arr_leaves))


def add_outer_dims_nest(specs, outer_dims: Sequence[int]):
  """Prefix every spec's shape with `outer_dims` (tensor_spec.py:472)."""
  outer = tuple(outer_dims)

  def _add(s):
    return s.replace(shape=outer + s.shape)

  return map_spec_nest(_add, specs)


def remove_outer_dims_nest(specs, num_outer_dims: int):
  """Strip `num_outer_dims` leading dims from every spec."""

  def _rm(s):
    if len(s.shape) < num_outer_dims:
      raise ValueError(f"Spec {s} has fewer than {num_outer_dims} outer dims")
    return s.replace(shape=s.shape[num_outer_dims:])

  return map_spec_nest(_rm, specs)


def spec_from_array_nest(arrays, num_outer_dims: int = 0):
  """Infer a spec nest from a data nest, stripping leading batch dims."""

  def _leaf(a):
    return ArraySpec(tuple(a.shape)[num_outer_dims:], a.dtype)

  return jax.tree_util.tree_map(_leaf, arrays)


def is_discrete(spec: ArraySpec) -> bool:
  return np.issubdtype(spec.dtype, np.integer) or spec.dtype == np.bool_

def is_continuous(spec: ArraySpec) -> bool:
  return np.issubdtype(spec.dtype, np.floating)
