"""Spec algebra tests (mirrors tf_agents/specs/array_spec_test.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agents_tpu import specs


def test_array_spec_basics():
  s = specs.ArraySpec((2, 3), np.float32, name="obs")
  assert s.shape == (2, 3)
  assert s.dtype == np.float32
  assert s.name == "obs"
  assert s == specs.ArraySpec((2, 3), "float32")
  assert s != specs.ArraySpec((2, 3), np.int32)
  assert hash(s) == hash(specs.ArraySpec((2, 3), np.float32))


def test_bounded_spec_basics():
  s = specs.BoundedArraySpec((), np.int64, minimum=0, maximum=3)
  assert s.num_values == 4
  assert s.check_array(np.asarray(2, np.int64))
  assert not s.check_array(np.asarray(5, np.int64))
  assert not s.check_array(np.asarray(2, np.int32))
  assert s != specs.ArraySpec((), np.int64)


def test_bounded_from_spec():
  base = specs.ArraySpec((4,), np.float32)
  b = specs.BoundedArraySpec.from_spec(base)
  assert b.shape == (4,)
  assert np.all(b.minimum == np.finfo(np.float32).min)


def test_sample_spec_nest_bounded():
  nest = {
      "a": specs.BoundedArraySpec((3,), np.float32, -1.0, 1.0),
      "b": specs.BoundedArraySpec((), np.int32, 0, 5),
  }
  out = specs.sample_spec_nest(nest, jax.random.key(0), outer_dims=(7,))
  assert out["a"].shape == (7, 3)
  assert out["a"].dtype == jnp.float32
  assert np.all(np.asarray(out["a"]) >= -1.0) and np.all(np.asarray(out["a"]) <= 1.0)
  assert out["b"].shape == (7,)
  assert np.all(np.asarray(out["b"]) >= 0) and np.all(np.asarray(out["b"]) <= 5)


def test_zero_and_check_nest():
  nest = (specs.ArraySpec((2,), np.float32),
          {"x": specs.BoundedArraySpec((), np.int32, 0, 9)})
  z = specs.zero_spec_nest(nest, outer_dims=(4,))
  assert z[0].shape == (4, 2)
  assert specs.check_arrays_nest(
      specs.zero_spec_nest(nest), nest)


def test_outer_dim_algebra():
  s = specs.ArraySpec((3,), np.float32)
  batched = specs.add_outer_dims_nest({"o": s}, (5, 2))
  assert batched["o"].shape == (5, 2, 3)
  back = specs.remove_outer_dims_nest(batched, 2)
  assert back["o"] == s


def test_spec_from_array_nest():
  arrays = {"o": np.zeros((8, 3), np.float32)}
  inferred = specs.spec_from_array_nest(arrays, num_outer_dims=1)
  assert inferred["o"] == specs.ArraySpec((3,), np.float32)


def test_discrete_continuous():
  assert specs.is_discrete(specs.ArraySpec((), np.int32))
  assert specs.is_continuous(specs.ArraySpec((), np.float32))
