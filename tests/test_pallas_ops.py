"""Pallas kernel tests (interpret mode on CPU; real-TPU exercise happens in
bench/verify runs)."""
import jax
import jax.numpy as jnp
import numpy as np

from agents_tpu.ops.replay_gather import _pallas_gather, gather_rows


def test_pallas_gather_interpret_matches_take():
  table = jnp.arange(64 * 256, dtype=jnp.float32).reshape(64, 256)
  idx = jnp.array([3, 60, 0, 7, 7, 63], jnp.int32)
  out = _pallas_gather(table, idx, interpret=True)
  np.testing.assert_array_equal(np.asarray(out),
                                np.asarray(jnp.take(table, idx, axis=0)))


def test_gather_rows_fallback_cpu():
  table = jnp.arange(20, dtype=jnp.float32).reshape(10, 2)
  idx = jnp.array([1, 9], jnp.int32)
  out = gather_rows(table, idx)
  np.testing.assert_array_equal(np.asarray(out), [[2, 3], [18, 19]])
