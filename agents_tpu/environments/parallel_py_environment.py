"""Process-parallel host environments.

Analogue of ``tf_agents/environments/parallel_py_environment.py:47,230``:
each env lives in its own subprocess behind a pipe-RPC with promise-style
async calls; child exceptions are re-raised in the parent with the child
traceback (reference :436-455).
"""
from __future__ import annotations

import atexit
import multiprocessing as mp
import sys
import traceback
from typing import Any, Callable, Sequence

import numpy as np

from agents_tpu.environments.py_environment import PyEnvironment

_CALL = "call"
_ACCESS = "access"
_RESULT = "result"
_EXCEPTION = "exception"
_CLOSE = "close"


def _worker(pipe, env_ctor):
  """Child loop (reference _worker :456)."""
  try:
    env = env_ctor()
    while True:
      try:
        message, payload = pipe.recv()
      except (EOFError, KeyboardInterrupt):
        break
      if message == _ACCESS:
        name = payload
        result = getattr(env, name)
        pipe.send((_RESULT, result))
      elif message == _CALL:
        name, args, kwargs = payload
        result = getattr(env, name)(*args, **kwargs)
        pipe.send((_RESULT, result))
      elif message == _CLOSE:
        env.close()
        break
      else:
        raise KeyError(f"Unknown message {message}")
  except Exception:  # pylint: disable=broad-except
    etype, evalue, tb = sys.exc_info()
    stacktrace = "".join(traceback.format_exception(etype, evalue, tb))
    try:
      pipe.send((_EXCEPTION, stacktrace))
    except Exception:
      pass
  finally:
    try:
      pipe.close()
    except Exception:
      pass


class ProcessPyEnvironment:
  """One env in a subprocess (reference ProcessPyEnvironment :230)."""

  def __init__(self, env_ctor: Callable[[], PyEnvironment],
               start_method: str = None):
    self._ctor = env_ctor
    self._conn = None
    self._process = None
    self._start_method = start_method

  def start(self):
    method = self._start_method
    if method is None:
      # fork keeps lambdas/closures working (no pickling); but forking
      # AFTER the JAX runtime has initialized clones its background
      # threads mid-lock and can deadlock the child. Prefer spawn once a
      # backend exists AND the ctor survives pickling; otherwise fall
      # back to fork with a warning (the reference's ordering — build
      # parallel envs before touching the accelerator — avoids both).
      jax_live = False
      try:
        from jax._src import xla_bridge as _xb
        jax_live = bool(_xb._backends)  # non-empty once initialized
      except Exception:
        pass
      method = "fork"
      if sys.platform == "win32":
        method = "spawn"
      elif jax_live:
        import pickle
        try:
          pickle.dumps(self._ctor)
          method = "spawn"
        except Exception:
          import warnings
          warnings.warn(
              "ParallelPyEnvironment: JAX runtime already initialized "
              "and env_ctor is not picklable — forking may deadlock the "
              "child if runtime threads hold locks. Construct parallel "
              "envs before first jax use, or pass a picklable ctor.",
              stacklevel=3)
    ctx = mp.get_context(method)
    self._conn, child_conn = ctx.Pipe()
    self._process = ctx.Process(
        target=_worker, args=(child_conn, self._ctor), daemon=True)
    self._process.start()
    child_conn.close()
    atexit.register(self.close)
    return self

  def _receive(self):
    message, payload = self._conn.recv()
    if message == _EXCEPTION:
      raise RuntimeError(
          f"Exception in ParallelPyEnvironment worker:\n{payload}")
    assert message == _RESULT, message
    return payload

  def access(self, name):
    self._conn.send((_ACCESS, name))
    return self._receive()

  def call(self, name, *args, **kwargs):
    """Async call: returns a promise (reference call :336)."""
    self._conn.send((_CALL, (name, args, kwargs)))
    return self._receive

  def call_sync(self, name, *args, **kwargs):
    return self.call(name, *args, **kwargs)()

  def step(self, action, blocking=True):
    promise = self.call("step", action)
    return promise() if blocking else promise

  def reset(self, blocking=True):
    promise = self.call("reset")
    return promise() if blocking else promise

  def close(self):
    if self._conn is not None:
      try:
        self._conn.send((_CLOSE, None))
        self._conn.close()
      except (IOError, OSError):
        pass
      self._conn = None
    if self._process is not None:
      self._process.join(3)
      if self._process.is_alive():
        self._process.terminate()
      self._process = None


class ParallelPyEnvironment(PyEnvironment):
  """N envs in N subprocesses, stepped as one batch (reference :47)."""

  def __init__(self, env_ctors: Sequence[Callable[[], PyEnvironment]],
               start_serially: bool = True, blocking: bool = False):
    super().__init__()
    self._blocking = blocking
    self._procs = [ProcessPyEnvironment(c) for c in env_ctors]
    # start() only forks the worker and returns; readiness is awaited
    # lazily at the first pipe call, so serial and parallel start are
    # identical here. The flag is kept for reference signature parity
    # (parallel_py_environment.py:47), where start can block on env
    # construction.
    del start_serially
    for p in self._procs:
      p.start()
    self._observation_spec = self._procs[0].call_sync("observation_spec")
    self._action_spec = self._procs[0].call_sync("action_spec")
    self._reward_spec = self._procs[0].call_sync("reward_spec")

  @property
  def batched(self):
    return True

  @property
  def batch_size(self):
    return len(self._procs)

  def observation_spec(self):
    return self._observation_spec

  def action_spec(self):
    return self._action_spec

  def reward_spec(self):
    return self._reward_spec

  def _stack(self, steps):
    import jax
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *steps)

  def _reset(self):
    # blocking=True steps workers serially (reference
    # parallel_py_environment.py:128 semantics: easier debugging,
    # deterministic interleaving); False overlaps them via promises.
    if self._blocking:
      return self._stack([p.reset(blocking=True) for p in self._procs])
    promises = [p.reset(blocking=False) for p in self._procs]
    return self._stack([pr() for pr in promises])

  def _step(self, actions):
    import jax
    unstacked = [
        jax.tree_util.tree_map(lambda x: np.asarray(x)[i], actions)
        for i in range(len(self._procs))
    ]
    if self._blocking:
      return self._stack([p.step(a, blocking=True)
                          for p, a in zip(self._procs, unstacked)])
    promises = [
        p.step(a, blocking=False)
        for p, a in zip(self._procs, unstacked)
    ]
    return self._stack([pr() for pr in promises])

  def step(self, action):
    if self._current_time_step is None:
      return self.reset()
    self._current_time_step = self._step(action)
    return self._current_time_step

  def seed(self, seeds):
    if np.ndim(seeds) == 0:
      # Distinct per-process streams; a broadcast scalar would collapse
      # the batch to one env's worth of data (see BatchedPyEnvironment).
      seeds = int(seeds) + np.arange(len(self._procs))
    seeds = np.asarray(seeds)
    if seeds.shape != (len(self._procs),):
      raise ValueError(f"need {len(self._procs)} seeds, got {seeds.shape}")
    promises = [
        p.call("seed", int(s)) for p, s in zip(self._procs, seeds)
    ]
    return [pr() for pr in promises]

  def close(self):
    for p in self._procs:
      p.close()
