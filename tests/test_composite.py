"""Composite (sparse/ragged) utilities — reference utils/composite.py
surface under static shapes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agents_tpu.utils import composite as comp


def _dense():
  x = np.zeros((3, 4), np.float32)
  x[0, 1] = 2.0
  x[1, 0] = -1.0
  x[2, 3] = 5.0
  return jnp.asarray(x)


def test_sparse_roundtrip():
  x = _dense()
  s = comp.SparseArray.from_dense(x, capacity=5)
  assert int(s.nnz()) == 3
  np.testing.assert_array_equal(np.asarray(s.to_dense()), np.asarray(x))


def test_sparse_capacity_check():
  with pytest.raises(ValueError):
    comp.SparseArray.from_dense(jnp.ones((3, 3)), capacity=4)


def test_sparse_under_jit_and_vmap():
  x = _dense()

  @jax.jit
  def f(d):
    s = comp.SparseArray.from_dense(d, capacity=5)
    return comp.slice_from(s, 0, 1).to_dense()

  np.testing.assert_array_equal(np.asarray(f(x)), np.asarray(x[1:]))


def test_shape_dispatch():
  x = _dense()
  s = comp.SparseArray.from_dense(x, capacity=4)
  np.testing.assert_array_equal(np.asarray(comp.shape(s)), [3, 4])
  np.testing.assert_array_equal(np.asarray(comp.shape(x)), [3, 4])


@pytest.mark.parametrize("new_shape", [(4, 3), (12,), (2, -1), (1, 3, 4)])
def test_sparse_reshape_matches_dense(new_shape):
  x = _dense()
  s = comp.SparseArray.from_dense(x, capacity=4)
  got = comp.reshape(s, new_shape).to_dense()
  want = comp.reshape(x, new_shape)
  np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sparse_squeeze_expand():
  x = _dense()
  s = comp.SparseArray.from_dense(x, capacity=4)
  e = comp.expand_dims(s, 1)
  assert e.dense_shape == (3, 1, 4)
  np.testing.assert_array_equal(np.asarray(e.to_dense()),
                                np.asarray(comp.expand_dims(x, 1)))
  q = comp.squeeze(e, 1)
  np.testing.assert_array_equal(np.asarray(q.to_dense()), np.asarray(x))
  with pytest.raises(ValueError):
    comp.squeeze(s, 0)


@pytest.mark.parametrize("axis,start", [(0, 1), (1, 2), (0, -2)])
def test_sparse_slice_from_matches_dense(axis, start):
  x = _dense()
  s = comp.SparseArray.from_dense(x, capacity=4)
  got = comp.slice_from(s, axis, start).to_dense()
  want = comp.slice_from(x, axis, start)
  np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("axis,end", [(0, 2), (1, 3), (1, -1)])
def test_sparse_slice_to_matches_dense(axis, end):
  x = _dense()
  s = comp.SparseArray.from_dense(x, capacity=4)
  got = comp.slice_to(s, axis, end).to_dense()
  want = comp.slice_to(x, axis, end)
  np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_ragged_from_rows_mask_splits():
  rows = [np.arange(3, dtype=np.float32),
          np.arange(1, dtype=np.float32),
          np.arange(4, dtype=np.float32)]
  r = comp.RaggedArray.from_rows(rows)
  assert r.values.shape == (3, 4)
  np.testing.assert_array_equal(np.asarray(r.lengths), [3, 1, 4])
  np.testing.assert_array_equal(np.asarray(r.row_splits()), [0, 3, 4, 8])
  m = np.asarray(r.mask())
  assert m.sum() == 8 and m[1, 1] == False  # noqa: E712


def test_ragged_slicing():
  rows = [np.arange(3, dtype=np.float32), np.arange(4, dtype=np.float32)]
  r = comp.RaggedArray.from_rows(rows)
  head = comp.slice_to(r, 1, 2)
  np.testing.assert_array_equal(np.asarray(head.lengths), [2, 2])
  np.testing.assert_array_equal(np.asarray(head.values),
                                [[0, 1], [0, 1]])
  tail = comp.slice_from(r, 1, 2)
  np.testing.assert_array_equal(np.asarray(tail.lengths), [1, 2])
  np.testing.assert_array_equal(np.asarray(tail.values[1, :2]), [2, 3])
