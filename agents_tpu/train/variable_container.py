"""Shared-memory variable container: learner -> collector weight sync.

The reference broadcasts weights to distributed collect jobs through a
Reverb variable-container table over gRPC
(``experimental/distributed/reverb_variable_container.py:41-160`` —
``push``/``pull``/``update`` with structure/dtype checking). Same-host
actor fan-out (N simulator processes beside one learner) doesn't need a
server: the learner publishes the parameter blob into POSIX shm behind a
single-writer seqlock (``native/varstore/varstore.cc``) and collectors
``pull`` the newest snapshot lock-free — microseconds instead of a
policy-file poll. Off-host collectors keep the policy-export path
(``policies/policy_saver.py`` + ``eval_job`` polling).

Codec: leaves of the params pytree are concatenated as raw C-order bytes
in ``tree_leaves`` order; both sides construct the container from the
same template (the agent's params), which fixes the treedef, shapes, and
dtypes — the analogue of the reference's variable_container signature
check.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Any, Optional, Tuple

import jax
import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libagents_tpu_varstore.so")

_lib = None


def ensure_built() -> str:
  src = os.path.join(_NATIVE_DIR, "varstore", "varstore.cc")
  # A pruned/installed tree may ship only the prebuilt .so; a missing
  # source must not fail the staleness probe when the library exists.
  stale = (not os.path.exists(_LIB_PATH)
           or (os.path.exists(src)
               and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)))
  if stale:
    try:
      subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                     capture_output=True)
    except (subprocess.CalledProcessError, OSError) as e:
      # git checkouts don't preserve mtimes, so a fresh clone can look
      # "stale" even with a good prebuilt library; without a toolchain the
      # rebuild fails. Keep the shipped binary rather than hard-failing.
      if os.path.exists(_LIB_PATH):
        import warnings
        warnings.warn(
            f"varstore rebuild failed ({e}); using prebuilt {_LIB_PATH}")
      else:
        raise
  return _LIB_PATH


def _load():
  global _lib
  if _lib is None:
    lib = ctypes.CDLL(ensure_built())
    lib.vs_create.restype = ctypes.c_void_p
    lib.vs_create.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
    lib.vs_open.restype = ctypes.c_void_p
    lib.vs_open.argtypes = [ctypes.c_char_p]
    lib.vs_write.restype = ctypes.c_int
    lib.vs_write.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                             ctypes.c_uint64, ctypes.c_int64]
    lib.vs_read.restype = ctypes.c_int
    lib.vs_read.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                            ctypes.c_uint64,
                            ctypes.POINTER(ctypes.c_uint64),
                            ctypes.POINTER(ctypes.c_int64)]
    lib.vs_step.restype = ctypes.c_int64
    lib.vs_step.argtypes = [ctypes.c_void_p]
    lib.vs_capacity.restype = ctypes.c_uint64
    lib.vs_capacity.argtypes = [ctypes.c_void_p]
    lib.vs_writes.restype = ctypes.c_uint64
    lib.vs_writes.argtypes = [ctypes.c_void_p]
    lib.vs_close.argtypes = [ctypes.c_void_p]
    lib.vs_unlink.restype = ctypes.c_int
    lib.vs_unlink.argtypes = [ctypes.c_char_p]
    _lib = lib
  return _lib


class VariableContainer:
  """Push/pull a params pytree through shared memory.

  Args:
    name: shm segment name (leading '/' added if missing).
    params_template: pytree fixing treedef/shapes/dtypes on both sides.
    create: learner side creates the segment; collectors open it.
  """

  def __init__(self, name: str, params_template: Any, create: bool = False):
    self._lib = _load()
    leaves = jax.tree_util.tree_leaves(params_template)
    self._treedef = jax.tree_util.tree_structure(params_template)
    self._shapes = [np.shape(x) for x in leaves]
    self._dtypes = [np.asarray(x).dtype for x in leaves]
    self._sizes = [int(np.prod(s)) * d.itemsize
                   for s, d in zip(self._shapes, self._dtypes)]
    self._payload_bytes = sum(self._sizes)
    self.name = name if name.startswith("/") else "/" + name
    n = self.name.encode()
    if create:
      self._h = self._lib.vs_create(n, self._payload_bytes)
    else:
      self._h = self._lib.vs_open(n)
    if not self._h:
      if create and os.path.exists("/dev/shm" + self.name):
        raise OSError(
            f"varstore segment {self.name} already exists (stale from a "
            "crashed or duplicate learner). Recreating it in place would "
            "orphan collectors mmap'ed to the old segment, so create "
            "refuses; call VariableContainer.unlink_name(name) first if "
            "you own the name.")
      raise OSError(f"varstore {'create' if create else 'open'} failed "
                    f"for {self.name}")
    if self._lib.vs_capacity(self._h) < self._payload_bytes:
      raise ValueError(
          f"segment capacity {self._lib.vs_capacity(self._h)} < template "
          f"payload {self._payload_bytes} — template mismatch")
    self._owner = create
    self._buf = ctypes.create_string_buffer(self._payload_bytes)

  # -- learner side --------------------------------------------------------
  def push(self, params: Any, step: int) -> None:
    """Publish new weights (reference `push`/`update`,
    reverb_variable_container.py:85,124)."""
    leaves = jax.tree_util.tree_leaves(params)
    if len(leaves) != len(self._shapes):
      raise ValueError("params structure differs from template")
    blob = b"".join(
        np.ascontiguousarray(np.asarray(x, dtype=d)).tobytes()
        for x, d in zip(leaves, self._dtypes))
    rc = self._lib.vs_write(self._h, blob, len(blob), int(step))
    if rc != 0:
      raise ValueError(f"vs_write failed rc={rc}")

  # -- collector side ------------------------------------------------------
  def pull(self) -> Optional[Tuple[Any, int]]:
    """Newest (params, step) snapshot, or None before the first push."""
    ln = ctypes.c_uint64()
    st = ctypes.c_int64()
    rc = self._lib.vs_read(self._h, self._buf, self._payload_bytes,
                           ctypes.byref(ln), ctypes.byref(st))
    if rc == -2:
      return None
    if rc != 0:
      raise OSError(f"vs_read failed rc={rc}")
    raw = self._buf.raw[:ln.value]
    leaves, off = [], 0
    for shape, dtype, size in zip(self._shapes, self._dtypes, self._sizes):
      leaves.append(np.frombuffer(raw, dtype=dtype, count=int(np.prod(shape)),
                                  offset=off).reshape(shape).copy())
      off += size
    return jax.tree_util.tree_unflatten(self._treedef, leaves), int(st.value)

  def step(self) -> int:
    """Train step of the newest payload (-1 before first push); the
    staleness-metric input."""
    return int(self._lib.vs_step(self._h))

  def writes(self) -> int:
    return int(self._lib.vs_writes(self._h))

  @staticmethod
  def unlink_name(name: str) -> None:
    """Remove a (possibly stale) segment by name, e.g. before `create`
    when this process owns the name and any prior owner is dead."""
    if not name.startswith("/"):
      name = "/" + name
    _load().vs_unlink(name.encode())

  def close(self) -> None:
    if self._h:
      self._lib.vs_close(self._h)
      self._h = None

  def unlink(self) -> None:
    self._lib.vs_unlink(self.name.encode())

  def __enter__(self):
    return self

  def __exit__(self, *a):
    self.close()
    if self._owner:
      self.unlink()
