"""Packed replay-row layout tests (ops/replay_gather.py).

The layout (not a kernel) is the TPU optimization: tile-aligned [r, 128]
blocks gather 1.79x faster than natural rows on chip — the hand-written
Pallas DMA kernel only matched XLA's gather on the same layout and was
deleted (module docstring records the measurements).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agents_tpu.ops import replay_gather as rg
from agents_tpu.specs import array_spec


@pytest.mark.parametrize("f,dtype", [(256, jnp.float32), (300, jnp.uint8),
                                     (28224, jnp.uint8), (5, jnp.float32)])
def test_pack_unpack_roundtrip(f, dtype):
  x = jnp.arange(7 * f).reshape(7, f).astype(dtype)
  p = rg.pack_rows(x)
  r, lanes = rg.packed_row_shape(f, dtype)
  assert p.shape == (7, r, lanes)
  assert lanes == 128 and (r * lanes) >= f
  np.testing.assert_array_equal(np.asarray(rg.unpack_rows(p, f)),
                                np.asarray(x))


def test_packed_row_shape_sublane_alignment():
  # uint8 sublane is 32: Atari row 28224 -> ceil(28224/128)=221 -> 224.
  assert rg.packed_row_shape(28224, jnp.uint8) == (224, 128)
  # float32 sublane is 8: 256 floats -> 2 rows -> padded to 8.
  assert rg.packed_row_shape(256, jnp.float32) == (8, 128)


def test_should_pack_threshold():
  assert rg.should_pack((84, 84, 4), np.uint8)       # 28 KB
  assert not rg.should_pack((4,), np.float32)        # classic control
  assert rg.should_pack((2048,), np.float32)         # 8 KB


def test_gather_rows_matches_take():
  table = jnp.arange(20, dtype=jnp.float32).reshape(10, 2)
  idx = jnp.array([1, 9], jnp.int32)
  out = rg.gather_rows(table, idx)
  np.testing.assert_array_equal(np.asarray(out), [[2, 3], [18, 19]])


def test_row_packer_mixed_nest():
  spec = {
      "frames": array_spec.ArraySpec((84, 84, 4), np.uint8),
      "state": array_spec.ArraySpec((4,), np.float32),
  }
  packer = rg.RowPacker(spec)
  assert packer.any_packed
  storage = packer.init_storage((6, 3))
  flat = packer.flatten(storage)
  # dict order: frames, state
  assert flat[0].shape == (6, 3, 224, 128)       # packed
  assert flat[1].shape == (6, 3, 4)              # natural

  items = {
      "frames": jnp.arange(3 * 84 * 84 * 4, dtype=jnp.uint8).reshape(
          3, 84, 84, 4),
      "state": jnp.ones((3, 4), jnp.float32),
  }
  stored = packer.to_stored(items, outer_ndim=1)
  assert packer.flatten(stored)[0].shape == (3, 224, 128)
  back = packer.from_stored(stored, outer_ndim=1)
  np.testing.assert_array_equal(np.asarray(back["frames"]),
                                np.asarray(items["frames"]))
  np.testing.assert_array_equal(np.asarray(back["state"]),
                                np.asarray(items["state"]))


def test_uniform_replay_packed_storage_end_to_end():
  """Frame-stack sized leaves ride packed storage transparently through
  add/sample/gather_all."""
  from agents_tpu.replay_buffers import UniformReplay

  spec = {
      "obs": array_spec.ArraySpec((40, 40, 4), np.uint8),   # 6.4 KB -> packed
      "reward": array_spec.ArraySpec((), np.float32),
  }
  rb = UniformReplay(spec, batch_size=2, max_length=8)
  state = rb.init()
  assert rb.packer.any_packed

  key = jax.random.key(0)
  frames = []
  for t in range(5):
    item = {
        "obs": jnp.full((2, 40, 40, 4), t, jnp.uint8),
        "reward": jnp.full((2,), float(t), jnp.float32),
    }
    frames.append(item)
    state = jax.jit(rb.add_batch)(state, item)

  batch, info = jax.jit(
      lambda s, k: rb.sample(s, k, 16))(state, key)
  assert batch["obs"].shape == (16, 40, 40, 4)
  ids = np.asarray(info.ids)
  obs = np.asarray(batch["obs"])
  rew = np.asarray(batch["reward"])
  for i in range(16):
    assert (obs[i] == ids[i]).all()        # payload == time id by construction
    assert rew[i] == float(ids[i])

  all_frames = rb.gather_all(state)
  assert all_frames["obs"].shape == (2, 8, 40, 40, 4)
  np.testing.assert_array_equal(np.asarray(all_frames["obs"][0, 3]),
                                np.full((40, 40, 4), 3, np.uint8))
