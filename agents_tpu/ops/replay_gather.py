"""Replay-sample gather: tile-aligned packed row layout for big frames.

Uniform replay sampling is a random gather of S rows from a
[capacity*B, F] HBM table (reference: ``tf_uniform_replay_buffer.py``'s
``_gather`` / dataset path). On TPU the gather's cost is dominated by
how the table is laid out, not by who issues the copies:

* On a natural [M, F] table, XLA's gather must honor the (8, 128)
  (sublane, lane) tiling of the two minor dims; a row of F=28224 uint8
  (Atari 84*84*4) is tile-misaligned, and every sampled row pays a
  relayout. Measured on TPU v5e at M=131072, S=256: **883 us/gather**.
* On a *packed* table [M, r, 128] — each logical row stored as a
  tile-aligned [r, 128] block (r = ceil(F/128) rounded up to the
  dtype's sublane) — dim 0 is untiled and a row gather is a pure
  HBM->HBM block copy. Same data, same S: **494 us/gather, 1.79x**.
  Packing costs <2% HBM (28224 -> 224*128=28672, +1.6%) and is applied
  once at insert (B rows/step), not per sample.

We also built a hand-rolled Pallas DMA-gather kernel over the packed
table (one program, scalar-prefetched indices, windowed async row
copies; validated bit-exact on chip incl. unaligned Atari rows). Best
window (32 in flight) measured **497 us/gather — parity with XLA's
take on the same layout** (sweep: w=8 583us, w=32 497us, w=64 527us,
start-all-256 524us, vs take 494us). Both are bound by per-row DMA
issue/drain (~2 us/row), so the kernel earned no keep: the layout is
the optimization, and XLA's gather already rides it at full speed.
The kernel was deleted (git history: `agents_tpu/ops/replay_gather.py`
pre-round-2); this module keeps the packed layout.

API:
  packed_row_shape(F, dtype) -> (r, 128)
  should_pack(row_shape, dtype) -> bool   (rows >= _MIN_ROW_BYTES)
  pack_rows(x)      [..., F] -> [..., r, 128]   (pad)
  unpack_rows(p, F) [..., r, 128] -> [..., F]   (slice)
  gather_rows(table [M, ...row], idx [S]) -> [S, ...row]
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_LANES = 128
_SUBLANE = {1: 32, 2: 16, 4: 8, 8: 4}

# Below this row byte count the natural layout is already cheap to
# gather (relayout cost ~ row size) and padding overhead dominates.
_MIN_ROW_BYTES = 4096


def packed_row_shape(f: int, dtype) -> tuple:
  """Tile-aligned 2D shape [r, 128] holding a row of f elements."""
  sub = _SUBLANE[np.dtype(dtype).itemsize]
  r = -(-f // _LANES)
  r = -(-r // sub) * sub
  return (r, _LANES)


def should_pack(row_shape: tuple, dtype) -> bool:
  """Whether a replay leaf with this per-frame shape should be stored
  packed ([r, 128] blocks). True for multi-KB rows (Atari frames etc.);
  small rows (classic-control vectors) stay natural."""
  row_bytes = int(np.prod(row_shape)) * np.dtype(dtype).itemsize
  return row_bytes >= _MIN_ROW_BYTES


def pack_rows(x: jax.Array) -> jax.Array:
  """[..., F] -> [..., r, 128] zero-padded. For multi-dim frames,
  flatten the feature dims first."""
  f = x.shape[-1]
  r, lanes = packed_row_shape(f, x.dtype)
  pad = r * lanes - f
  flat = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
  return flat.reshape(x.shape[:-1] + (r, lanes))


def unpack_rows(p: jax.Array, f: int) -> jax.Array:
  """[..., r, 128] -> [..., F]."""
  flat = p.reshape(p.shape[:-2] + (p.shape[-2] * p.shape[-1],))
  return flat[..., :f]


def gather_rows(table: jax.Array, indices: jax.Array) -> jax.Array:
  """table: [N, ...row]; indices: [S] int32 -> [S, ...row].

  Plain XLA gather: on a tile-aligned (packed) table it matches the
  hand-written DMA kernel (module docstring has the chip measurements),
  so there is nothing to hand-schedule.
  """
  return jnp.take(table, indices, axis=0)


class RowPacker:
  """Per-leaf packed-storage policy for a replay ``data_spec``.

  Leaves whose per-frame payload is >= _MIN_ROW_BYTES are stored as
  tile-aligned [r, 128] blocks (the 1.79x gather win above); small
  leaves keep their natural feature shape. The packer owns the
  spec treedef so replay buffers can flatten/unflatten nests and
  convert frames <-> storage representation per leaf.
  """

  def __init__(self, data_spec, enabled: bool = True):
    leaves, self.treedef = jax.tree_util.tree_flatten(data_spec)
    self.feat_shapes = [tuple(int(d) for d in l.shape) for l in leaves]
    self.dtypes = [np.dtype(l.dtype) for l in leaves]
    self.packed = [bool(enabled) and should_pack(l.shape, l.dtype)
                   for l in leaves]
    self.any_packed = any(self.packed)

  def flatten(self, tree):
    return self.treedef.flatten_up_to(tree)

  def unflatten(self, leaves):
    return jax.tree_util.tree_unflatten(self.treedef, leaves)

  def stored_shape(self, i: int) -> tuple:
    """Per-frame shape as stored (packed block or natural)."""
    feat = self.feat_shapes[i]
    if not self.packed[i]:
      return feat
    return packed_row_shape(int(np.prod(feat)), self.dtypes[i])

  def init_storage(self, outer_dims: tuple):
    """Zero storage pytree with leaves [*outer_dims, *stored]."""
    leaves = [
        jnp.zeros(tuple(outer_dims) + self.stored_shape(i), self.dtypes[i])
        for i in range(len(self.feat_shapes))
    ]
    return self.unflatten(leaves)

  def to_stored(self, items, outer_ndim: int):
    """Frames [*outer, *feat] -> storage repr [*outer, *stored]."""
    if not self.any_packed:
      return items
    out = []
    for i, x in enumerate(self.flatten(items)):
      if self.packed[i]:
        outer = x.shape[:outer_ndim]
        f = int(np.prod(self.feat_shapes[i]))
        x = pack_rows(x.reshape(outer + (f,)))
      out.append(x)
    return self.unflatten(out)

  def from_stored(self, items, outer_ndim: int):
    """Storage repr [*outer, *stored] -> frames [*outer, *feat]."""
    if not self.any_packed:
      return items
    out = []
    for i, x in enumerate(self.flatten(items)):
      if self.packed[i]:
        outer = x.shape[:outer_ndim]
        feat = self.feat_shapes[i]
        x = unpack_rows(x, int(np.prod(feat))).reshape(outer + feat)
      out.append(x)
    return self.unflatten(out)
