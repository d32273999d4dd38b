"""Pytree ("nest") algebra: batching, splitting, stacking, outer-rank inference.

Analogue of ``tf_agents/utils/nest_utils.py``. JAX pytrees replace tf.nest;
specs are `agents_tpu.specs.ArraySpec` nests.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from agents_tpu.specs import array_spec

tree_map = jax.tree_util.tree_map


def flatten(nest) -> list:
  return jax.tree_util.tree_leaves(nest)


def assert_same_structure(a, b, message: str = ""):
  sa = jax.tree_util.tree_structure(a)
  sb = jax.tree_util.tree_structure(b)
  if sa != sb:
    raise ValueError(f"{message} Structures differ: {sa} vs {sb}")


def get_outer_rank(nest, specs) -> int:
  """Number of leading batch dims shared by all leaves (reference :918).

  Raises if leaves disagree or inner shapes don't match the specs.
  """
  leaves = jax.tree_util.tree_leaves(nest)
  spec_leaves = jax.tree_util.tree_leaves(specs, is_leaf=array_spec._is_spec)
  if len(leaves) != len(spec_leaves):
    raise ValueError(
        f"nest / spec leaf count mismatch: {len(leaves)} vs {len(spec_leaves)}")
  outer_rank = None
  for leaf, spec in zip(leaves, spec_leaves):
    inner = spec.shape
    shape = tuple(jnp.shape(leaf))
    if len(shape) < len(inner) or (len(inner) > 0 and shape[len(shape) - len(inner):] != inner):
      raise ValueError(f"Leaf shape {shape} does not end with spec shape {inner}")
    rank = len(shape) - len(inner)
    if outer_rank is None:
      outer_rank = rank
    elif outer_rank != rank:
      raise ValueError(
          f"Inconsistent outer ranks across leaves: {outer_rank} vs {rank}")
  return 0 if outer_rank is None else outer_rank


def get_outer_shape(nest, specs) -> tuple:
  """Leading batch shape shared by all leaves (reference :886).

  Raises when leaves agree on outer RANK but disagree on outer SIZES —
  a corrupted nest must fail here, not misalign rows downstream."""
  rank = get_outer_rank(nest, specs)
  leaves = jax.tree_util.tree_leaves(nest)
  if not leaves:
    return ()
  outer = tuple(jnp.shape(leaves[0]))[:rank]
  for leaf in leaves[1:]:
    if tuple(jnp.shape(leaf))[:rank] != outer:
      raise ValueError(
          f"Inconsistent outer dims across nest leaves: {outer} vs "
          f"{tuple(jnp.shape(leaf))[:rank]}")
  return outer


def is_batched_nested_tensors(nest, specs, num_outer_dims: int = 1) -> bool:
  """True iff every leaf has exactly `num_outer_dims` batch dims (:472)."""
  try:
    return get_outer_rank(nest, specs) == num_outer_dims
  except ValueError:
    return False


def batch_nested_array(nest):
  return tree_map(lambda x: jnp.expand_dims(x, 0), nest)


def unbatch_nested_array(nest):
  return tree_map(lambda x: jnp.squeeze(x, 0), nest)


def unstack_nested_arrays(nest):
  """[B, ...] nest -> list of B unbatched nests (reference
  nest_utils.unstack_nested_arrays). Host-side (numpy) utility."""
  import numpy as np
  leaves, treedef = jax.tree_util.tree_flatten(nest)
  if not leaves:
    return []
  b = np.shape(leaves[0])[0]
  return [
      jax.tree_util.tree_unflatten(
          treedef, [np.asarray(leaf)[i] for leaf in leaves])
      for i in range(b)
  ]


def batch_nested_tensors(nest, specs=None):
  """Add a leading batch dim of 1 where missing (reference :626)."""
  if specs is None:
    return batch_nested_array(nest)

  def _batch(x, s):
    if len(jnp.shape(x)) == len(s.shape):
      return jnp.expand_dims(x, 0)
    return x

  return _map_with_specs(_batch, nest, specs)


def unbatch_nested_tensors(nest, specs=None):
  if specs is None:
    return unbatch_nested_array(nest)

  def _unbatch(x, s):
    if len(jnp.shape(x)) == len(s.shape) + 1:
      return jnp.squeeze(x, 0)
    return x

  return _map_with_specs(_unbatch, nest, specs)


def _map_with_specs(fn, nest, specs):
  leaves, treedef = jax.tree_util.tree_flatten(nest)
  spec_leaves = jax.tree_util.tree_leaves(specs, is_leaf=array_spec._is_spec)
  return jax.tree_util.tree_unflatten(
      treedef, [fn(x, s) for x, s in zip(leaves, spec_leaves)])


def split_nested_tensors(nest, specs, num_or_size_splits):
  """Split along dim 0 into a list of nests (reference :744)."""
  leaves, treedef = jax.tree_util.tree_flatten(nest)
  split_leaves = [jnp.split(x, num_or_size_splits, axis=0) for x in leaves]
  n = len(split_leaves[0])
  return [
      jax.tree_util.tree_unflatten(treedef, [sl[i] for sl in split_leaves])
      for i in range(n)
  ]


def unstack_nested_tensors(nest, specs=None):
  """Unstack dim 0 into a list of unbatched nests (reference :795)."""
  leaves, treedef = jax.tree_util.tree_flatten(nest)
  if not leaves:
    return []
  n = leaves[0].shape[0]
  return [
      jax.tree_util.tree_unflatten(treedef, [x[i] for x in leaves])
      for i in range(n)
  ]


def stack_nested_tensors(nests, axis: int = 0):
  """Stack a list of nests along a new axis (reference :828)."""
  return tree_map(lambda *xs: jnp.stack(xs, axis=axis), *nests)


def stack_nested_arrays(nests, axis: int = 0):
  return jax.tree_util.tree_map(
      lambda *xs: np.stack(xs, axis=axis), *nests)


def concat_nested_tensors(nests, axis: int = 0):
  return tree_map(lambda *xs: jnp.concatenate(xs, axis=axis), *nests)


def tile_batch(nest, multiplier: int):
  """Tile each leaf along dim 0 (reference :1229)."""
  return tree_map(
      lambda t: jnp.repeat(t, multiplier, axis=0), nest)


def where(condition, true_nest, false_nest):
  """Leaf-wise select with broadcast of `condition` over inner dims (:1100)."""

  def _where(t, f):
    cond = condition
    extra = len(jnp.shape(t)) - len(jnp.shape(cond))
    cond = jnp.reshape(cond, jnp.shape(cond) + (1,) * extra)
    return jnp.where(cond, t, f)

  return tree_map(_where, true_nest, false_nest)


def prune_extra_keys(narrow, wide):
  """Drop dict keys in `wide` absent from `narrow` (reference :202)."""
  if isinstance(narrow, dict) and isinstance(wide, dict):
    return type(wide)(
        (k, prune_extra_keys(narrow[k], wide[k])) for k in narrow if k in wide)
  if isinstance(narrow, (list, tuple)) and isinstance(wide, (list, tuple)) \
      and not hasattr(narrow, "_fields"):
    if len(narrow) != len(wide):
      return wide
    pruned = [prune_extra_keys(n, w) for n, w in zip(narrow, wide)]
    return type(wide)(pruned) if not hasattr(wide, "_fields") else wide
  return wide


def has_tensors(*nests) -> bool:
  return any(
      isinstance(leaf, jax.Array)
      for nest in nests for leaf in jax.tree_util.tree_leaves(nest))


def select_batch(nest, index):
  """nest[index] over leading dim for every leaf."""
  return tree_map(lambda x: x[index], nest)
