"""Composite (sparse / ragged) array utilities.

Analogue of ``tf_agents/utils/composite.py`` (shape/reshape/squeeze/
expand_dims/slice_from/slice_to over dense-or-SparseTensor) plus the
RaggedTensor handling scattered through the reference's nest utilities.

TPU-native design: XLA requires static shapes, so sparsity cannot be a
dynamic-size index list. Instead:

* ``SparseArray`` — COO with a STATIC nonzero capacity: ``indices``
  [capacity, ndim] int32, ``values`` [capacity], ``valid`` [capacity]
  bool, and a static ``dense_shape``. Out-of-capacity nonzeros are an
  error at trace time (from_dense checks when run eagerly) and simply
  truncated under jit. All ops are fixed-shape masked math, so a
  SparseArray flows through jit/vmap/scan like any other pytree.
* ``RaggedArray`` — padded ``values`` [B, L_max, ...] + ``lengths``
  [B] int32. The dense-padded layout IS the TPU representation; ops
  maintain the lengths.

The six generic ops below accept plain jnp arrays too, matching the
reference's transparent dispatch.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class SparseArray:
  """Static-capacity COO sparse array (pytree)."""
  indices: jax.Array             # [capacity, ndim] int32
  values: jax.Array              # [capacity, ...]
  valid: jax.Array               # [capacity] bool
  dense_shape: Tuple[int, ...] = struct.field(pytree_node=False)

  @property
  def capacity(self) -> int:
    return self.indices.shape[0]

  def nnz(self) -> jax.Array:
    return self.valid.sum()

  @classmethod
  def from_dense(cls, x: jax.Array, capacity: int) -> "SparseArray":
    """Top-`capacity` nonzeros of `x` (row-major order). Eagerly checks
    that `capacity` covers all nonzeros; under jit, excess is truncated."""
    flat = x.reshape(-1)
    nz = flat != 0
    n = nz.sum()
    if not isinstance(n, jax.core.Tracer):
      if int(n) > capacity:
        raise ValueError(f"{int(n)} nonzeros exceed capacity {capacity}")
    # Stable order: nonzeros first, by flat position.
    order = jnp.argsort(jnp.where(nz, jnp.arange(flat.shape[0]),
                                  flat.shape[0]))[:capacity]
    valid = jnp.take(nz, order)
    flat_idx = jnp.where(valid, order, 0)
    idx = jnp.stack(jnp.unravel_index(flat_idx, x.shape), -1).astype(jnp.int32)
    vals = jnp.where(valid, jnp.take(flat, flat_idx), 0)
    return cls(indices=idx, values=vals, valid=valid,
               dense_shape=tuple(int(d) for d in x.shape))

  def to_dense(self) -> jax.Array:
    out = jnp.zeros(self.dense_shape, self.values.dtype)
    vals = jnp.where(self.valid, self.values, 0)
    # Invalid slots scatter 0 into position 0: harmless by construction.
    return out.at[tuple(self.indices[:, i]
                        for i in range(self.indices.shape[1]))].add(vals)


@struct.dataclass
class RaggedArray:
  """Padded ragged batch: values [B, L_max, ...] + lengths [B]."""
  values: jax.Array
  lengths: jax.Array             # [B] int32

  @classmethod
  def from_rows(cls, rows, l_max: int = None) -> "RaggedArray":
    """Build from a python list of [l_i, ...] arrays (host-side)."""
    lengths = np.array([r.shape[0] for r in rows], np.int32)
    l_max = int(l_max or lengths.max(initial=0))
    tail = rows[0].shape[1:] if rows else ()
    out = np.zeros((len(rows), l_max) + tuple(tail),
                   rows[0].dtype if rows else np.float32)
    for i, r in enumerate(rows):
      out[i, :r.shape[0]] = r
    return cls(values=jnp.asarray(out), lengths=jnp.asarray(lengths))

  def mask(self) -> jax.Array:
    """[B, L_max] bool validity mask."""
    return (jnp.arange(self.values.shape[1])[None, :]
            < self.lengths[:, None])

  def row_splits(self) -> jax.Array:
    """tf.RaggedTensor-style row_splits [B+1]."""
    return jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(self.lengths)])


# -- generic ops (reference composite.py surface) ---------------------------

def shape(t):
  """reference :25 — dense_shape for sparse, shape otherwise."""
  if isinstance(t, SparseArray):
    return jnp.asarray(t.dense_shape, jnp.int64)
  if isinstance(t, RaggedArray):
    return jnp.asarray(t.values.shape, jnp.int64)
  return jnp.asarray(jnp.shape(t), jnp.int64)


def _resolve_shape(new_shape, old_size: int) -> Tuple[int, ...]:
  dims = [int(d) for d in new_shape]
  if dims.count(-1) > 1:
    raise ValueError("at most one -1 dim")
  if -1 in dims:
    rest = int(np.prod([d for d in dims if d != -1]))
    dims[dims.index(-1)] = old_size // max(rest, 1)
  return tuple(dims)


def reshape(t, new_shape):
  """reference :32 — index-space reshape for SparseArray."""
  if isinstance(t, SparseArray):
    dims = _resolve_shape(new_shape, int(np.prod(t.dense_shape)))
    if int(np.prod(dims)) != int(np.prod(t.dense_shape)):
      raise ValueError(f"cannot reshape {t.dense_shape} to {dims}")
    flat = _flat_indices(t)
    idx = jnp.stack(jnp.unravel_index(flat, dims), -1).astype(jnp.int32)
    return SparseArray(indices=idx, values=t.values, valid=t.valid,
                       dense_shape=dims)
  return jnp.reshape(t, tuple(int(d) for d in new_shape))


def _flat_indices(t: SparseArray) -> jax.Array:
  strides = np.concatenate(
      [np.cumprod(np.asarray(t.dense_shape[1:], np.int64)[::-1])[::-1],
       [1]]).astype(np.int32)
  return (t.indices * strides[None, :]).sum(-1)


def squeeze(t, axis: int):
  """reference :49 — drop a size-1 dim."""
  if isinstance(t, SparseArray):
    axis = axis % len(t.dense_shape)
    if t.dense_shape[axis] != 1:
      raise ValueError(f"dim {axis} is {t.dense_shape[axis]}, not 1")
    keep = [i for i in range(len(t.dense_shape)) if i != axis]
    return SparseArray(indices=t.indices[:, keep], values=t.values,
                       valid=t.valid,
                       dense_shape=tuple(t.dense_shape[i] for i in keep))
  return jnp.squeeze(t, axis=axis)


def expand_dims(t, axis: int):
  """reference :94."""
  if isinstance(t, SparseArray):
    nd = len(t.dense_shape)
    axis = axis % (nd + 1)
    zeros = jnp.zeros((t.capacity, 1), jnp.int32)
    idx = jnp.concatenate([t.indices[:, :axis], zeros, t.indices[:, axis:]],
                          axis=1)
    new_shape = t.dense_shape[:axis] + (1,) + t.dense_shape[axis:]
    return SparseArray(indices=idx, values=t.values, valid=t.valid,
                       dense_shape=new_shape)
  return jnp.expand_dims(t, axis=axis)


def slice_from(t, axis: int, start: int):
  """reference :130 — t[..., start:, ...] along `axis`. Negative start
  counts from the end. Sparse keeps static capacity; out-of-range
  entries are invalidated and indices shifted."""
  if isinstance(t, SparseArray):
    axis = axis % len(t.dense_shape)
    size = t.dense_shape[axis]
    start = start % size if start < 0 else start
    keep = t.valid & (t.indices[:, axis] >= start)
    idx = t.indices.at[:, axis].add(
        jnp.where(keep, -start, 0))
    idx = jnp.where(keep[:, None], idx, 0)
    new_shape = (t.dense_shape[:axis] + (size - start,)
                 + t.dense_shape[axis + 1:])
    return SparseArray(indices=idx,
                       values=jnp.where(keep, t.values, 0),
                       valid=keep, dense_shape=new_shape)
  if isinstance(t, RaggedArray):
    if axis != 1:
      raise ValueError("RaggedArray slicing is along the ragged axis (1)")
    vals = jax.lax.slice_in_dim(t.values, start, t.values.shape[1], axis=1)
    return RaggedArray(values=vals,
                       lengths=jnp.maximum(t.lengths - start, 0))
  idx = [slice(None)] * t.ndim
  idx[axis] = slice(start, None)
  return t[tuple(idx)]


def slice_to(t, axis: int, end: int):
  """reference :179 — t[..., :end, ...] along `axis`."""
  if isinstance(t, SparseArray):
    axis = axis % len(t.dense_shape)
    size = t.dense_shape[axis]
    end = end % size if end < 0 else end
    keep = t.valid & (t.indices[:, axis] < end)
    idx = jnp.where(keep[:, None], t.indices, 0)
    new_shape = t.dense_shape[:axis] + (end,) + t.dense_shape[axis + 1:]
    return SparseArray(indices=idx, values=jnp.where(keep, t.values, 0),
                       valid=keep, dense_shape=new_shape)
  if isinstance(t, RaggedArray):
    if axis != 1:
      raise ValueError("RaggedArray slicing is along the ragged axis (1)")
    return RaggedArray(values=jax.lax.slice_in_dim(t.values, 0, end, axis=1),
                       lengths=jnp.minimum(t.lengths, end))
  idx = [slice(None)] * t.ndim
  idx[axis] = slice(None, end)
  return t[tuple(idx)]
