"""Python bindings for the native trajectory ingest ring.

The dm-reverb replacement for off-device actors (SURVEY.md §2.9): actor
processes push fixed-size trajectory frames into a lock-free shared-memory
ring (native/ingest/ingest.cc); the learner host drains batches and
device_puts them into the on-HBM UniformReplay.

Frame codec: a Trajectory frame (one env row) is flattened leaf-wise into
a contiguous byte record ordered by the spec's tree_leaves order.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np

from agents_tpu.specs import array_spec

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libagents_tpu_ingest.so")

_lib = None


def ensure_built() -> str:
  """Build the native library if missing or stale (make -C native)."""
  src = os.path.join(_NATIVE_DIR, "ingest", "ingest.cc")
  if (not os.path.exists(_LIB_PATH)
      or os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)):
    try:
      subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                     capture_output=True)
    except (subprocess.CalledProcessError, OSError) as e:
      # git checkouts don't preserve mtimes: a fresh clone can look stale
      # with a perfectly good prebuilt .so, and hosts without a C++
      # toolchain would then fail on an import that used to work. Prefer
      # the shipped binary over hard-failing.
      if os.path.exists(_LIB_PATH):
        import warnings
        warnings.warn(
            f"ingest rebuild failed ({e}); using prebuilt {_LIB_PATH}")
      else:
        raise
  return _LIB_PATH


def _load():
  global _lib
  if _lib is not None:
    return _lib
  lib = ctypes.CDLL(ensure_built())
  lib.ingest_create.restype = ctypes.c_void_p
  lib.ingest_create.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                ctypes.c_uint64]
  lib.ingest_attach.restype = ctypes.c_void_p
  lib.ingest_attach.argtypes = [ctypes.c_char_p]
  lib.ingest_push.restype = ctypes.c_uint64
  lib.ingest_push.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                              ctypes.c_uint64]
  lib.ingest_try_push.restype = ctypes.c_uint64
  lib.ingest_try_push.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                  ctypes.c_uint64]
  lib.ingest_drain.restype = ctypes.c_uint64
  lib.ingest_drain.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                               ctypes.c_uint64]
  for name in ("ingest_frame_bytes", "ingest_capacity", "ingest_size",
               "ingest_dropped"):
    fn = getattr(lib, name)
    fn.restype = ctypes.c_uint64
    fn.argtypes = [ctypes.c_void_p]
  lib.ingest_close.restype = None
  lib.ingest_close.argtypes = [ctypes.c_void_p]
  _lib = lib
  return lib


class FrameCodec:
  """Flat byte codec for one spec-conforming frame."""

  def __init__(self, data_spec):
    self.data_spec = data_spec
    self.leaves = jax.tree_util.tree_leaves(
        data_spec, is_leaf=lambda s: isinstance(s, array_spec.ArraySpec))
    self.treedef = jax.tree_util.tree_structure(
        data_spec, is_leaf=lambda s: isinstance(s, array_spec.ArraySpec))
    self.offsets = []
    off = 0
    for s in self.leaves:
      nbytes = int(np.prod(s.shape, dtype=np.int64)) * np.dtype(
          s.dtype).itemsize
      self.offsets.append((off, nbytes))
      off += nbytes
    self.frame_bytes = off

  def encode_batch(self, frames) -> np.ndarray:
    """frames: nest with leaves [B, ...spec]; returns [B, frame_bytes]
    uint8."""
    leaves = jax.tree_util.tree_leaves(frames)
    b = leaves[0].shape[0]
    out = np.empty((b, self.frame_bytes), np.uint8)
    for leaf, spec, (off, nbytes) in zip(leaves, self.leaves, self.offsets):
      arr = np.ascontiguousarray(np.asarray(leaf, np.dtype(spec.dtype)))
      out[:, off:off + nbytes] = arr.reshape(b, -1).view(np.uint8)
    return out

  def decode_batch(self, buf: np.ndarray):
    """buf: [B, frame_bytes] uint8 -> nest with [B, ...spec] leaves."""
    b = buf.shape[0]
    leaves = []
    for spec, (off, nbytes) in zip(self.leaves, self.offsets):
      raw = np.ascontiguousarray(buf[:, off:off + nbytes])
      arr = raw.view(np.dtype(spec.dtype)).reshape((b,) + spec.shape)
      leaves.append(arr)
    return jax.tree_util.tree_unflatten(self.treedef, leaves)


class IngestServer:
  """Learner-side ring owner + drain."""

  def __init__(self, name: str, data_spec, capacity: int = 1 << 14):
    self.codec = FrameCodec(data_spec)
    self._lib = _load()
    self.name = name if name.startswith("/") else "/" + name
    self._h = self._lib.ingest_create(
        self.name.encode(), self.codec.frame_bytes, capacity)
    if not self._h:
      raise RuntimeError(f"ingest_create failed for {name}")

  def size(self) -> int:
    return int(self._lib.ingest_size(self._h))

  def dropped(self) -> int:
    return int(self._lib.ingest_dropped(self._h))

  def drain(self, max_frames: int = 4096):
    """Returns a decoded nest of up to max_frames frames (or None)."""
    buf = np.empty((max_frames, self.codec.frame_bytes), np.uint8)
    n = int(self._lib.ingest_drain(
        self._h, buf.ctypes.data_as(ctypes.c_void_p), max_frames))
    if n == 0:
      return None
    return self.codec.decode_batch(buf[:n])

  def close(self):
    if self._h:
      self._lib.ingest_close(self._h)
      self._h = None

  def __del__(self):
    try:
      self.close()
    except Exception:
      pass


class IngestClient:
  """Actor-side producer."""

  def __init__(self, name: str, data_spec):
    self.codec = FrameCodec(data_spec)
    self._lib = _load()
    self.name = name if name.startswith("/") else "/" + name
    self._h = self._lib.ingest_attach(self.name.encode())
    if not self._h:
      raise RuntimeError(f"ingest_attach failed for {name}")
    if int(self._lib.ingest_frame_bytes(self._h)) != self.codec.frame_bytes:
      raise ValueError("frame_bytes mismatch: spec disagrees with server")

  def push(self, frames) -> int:
    """frames: nest with [B, ...spec] leaves. Returns frames accepted."""
    buf = np.ascontiguousarray(self.codec.encode_batch(frames))
    return int(self._lib.ingest_push(
        self._h, buf.ctypes.data_as(ctypes.c_void_p), buf.shape[0]))

  def push_blocking(self, frames, timeout: Optional[float] = None,
                    poll_interval: float = 0.002) -> int:
    """Push all frames, waiting for ring space instead of dropping.

    The producer-side half of Reverb's rate limiting: a full ring means
    the learner is behind, so the actor blocks (bounding policy
    staleness) rather than silently discarding experience. Returns
    frames accepted (< B only on timeout)."""
    import time as _time

    buf = np.ascontiguousarray(self.codec.encode_batch(frames))
    total = buf.shape[0]
    sent = 0
    deadline = None if timeout is None else _time.monotonic() + timeout
    while sent < total:
      chunk = np.ascontiguousarray(buf[sent:])
      n = int(self._lib.ingest_try_push(
          self._h, chunk.ctypes.data_as(ctypes.c_void_p), chunk.shape[0]))
      sent += n
      if sent < total:
        if deadline is not None and _time.monotonic() >= deadline:
          break
        _time.sleep(poll_interval)
    return sent

  def close(self):
    if self._h:
      self._lib.ingest_close(self._h)
      self._h = None
