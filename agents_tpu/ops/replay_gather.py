"""Pallas TPU kernel: replay-sample gather.

Uniform replay sampling is a random gather of S window rows from a
[capacity*B, F] HBM table (uniform_replay._gather). XLA lowers jnp.take to
a generic gather that stages through costly scatter/gather HLO for large
F; this kernel instead streams each sampled row HBM->VMEM with an async
copy driven by scalar-prefetched indices (the canonical
PrefetchScalarGridSpec pattern from the Pallas TPU guide), double-buffered
across the sample grid.

Use `gather_rows(table, indices)`; falls back to jnp.take on non-TPU
backends and for tiny rows where the gather is already memory-trivial.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Below this row size the XLA gather is fine and kernel launch overhead
# dominates.
_MIN_ROW_ELEMS = 512


def _gather_kernel(idx_ref, table_hbm, out_ref, scratch, sems):
  """Grid: one program per sampled row; double-buffered row DMA."""
  i = pl.program_id(0)
  n = pl.num_programs(0)
  slot = i % 2

  # Start this row's DMA (the previous program started ours already except
  # for i == 0; keep it simple: start now, wait now — the grid pipeline
  # overlaps adjacent programs' DMAs anyway).
  row = idx_ref[i]
  dma = pltpu.make_async_copy(
      table_hbm.at[row], scratch.at[slot], sems.at[slot])
  dma.start()
  dma.wait()
  out_ref[0, ...] = scratch[slot]


def _pallas_gather(table: jax.Array, indices: jax.Array,
                   interpret: bool = False) -> jax.Array:
  n_out = indices.shape[0]
  row_shape = table.shape[1:]

  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=1,
      grid=(n_out,),
      in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
      out_specs=pl.BlockSpec(
          (1,) + row_shape, lambda i, idx_ref: (i,) + (0,) * len(row_shape),
          memory_space=pltpu.VMEM),
      scratch_shapes=[
          pltpu.VMEM((2,) + row_shape, table.dtype),
          pltpu.SemaphoreType.DMA((2,)),
      ],
  )
  return pl.pallas_call(
      _gather_kernel,
      grid_spec=grid_spec,
      out_shape=jax.ShapeDtypeStruct((n_out,) + row_shape, table.dtype),
      interpret=interpret,
  )(indices.astype(jnp.int32), table)


def gather_rows(table: jax.Array, indices: jax.Array,
                use_pallas: bool = True) -> jax.Array:
  """table: [N, ...row]; indices: [S] int32 -> [S, ...row]."""
  row_elems = int(np.prod(table.shape[1:])) if table.ndim > 1 else 1
  on_tpu = jax.default_backend() == "tpu" or any(
      d.platform in ("tpu",) for d in jax.devices())
  if (not use_pallas) or (not on_tpu) or row_elems < _MIN_ROW_ELEMS \
      or table.ndim < 2:
    return jnp.take(table, indices, axis=0)
  # Pallas path needs the last dim lane-aligned; fall back otherwise.
  if table.shape[-1] % 128 != 0:
    return jnp.take(table, indices, axis=0)
  return _pallas_gather(table, indices)
