"""Asynchronous host-device training: collector and trainer overlap.

This is the single-chip embodiment of the reference's distributed
actor-learner (SURVEY.md §3.3: N collect processes + a learner process
around a Reverb server). Device arrays are immutable, so the two host
threads share state race-free by swapping *references*:

  collector thread: device call (replay insert + policy action) + host
                    env step; publishes the newest replay_state.
  trainer thread:   device call (K gradient steps on a replay snapshot);
                    publishes the newest agent_state (params the collector
                    reads = the variable-container push/pull, without a
                    container).

The chip serializes the actual programs, but keeping two dispatch queues
full hides the tunnel/dispatch latency that bounds the synchronous
HostDeviceTrainLoop. An optional `utd_ratio` throttles the trainer to a
fixed gradient-steps-per-env-step budget (the reference SAC config is
1.0).
"""
from __future__ import annotations

import os
import threading
import time
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from agents_tpu.specs import array_spec
from agents_tpu.trajectories import policy_step as ps
from agents_tpu.trajectories import trajectory as tj


class AsyncHostDeviceTrainLoop:

  def __init__(self, env, agent, replay, sample_batch_size: int = 256,
               train_steps_per_call: int = 8,
               utd_ratio: Optional[float] = None,
               min_replay_frames: int = 1000, py_metrics=()):
    self.env = env
    self.agent = agent
    self.replay = replay
    self.sample_batch_size = sample_batch_size
    self.train_steps_per_call = train_steps_per_call
    self.utd_ratio = utd_ratio
    self.min_replay_frames = min_replay_frames
    self.py_metrics = list(py_metrics)

    self._collect_prog = jax.jit(self._collect_fn,
                                 static_argnames=("insert",))
    self._train_prog = jax.jit(self._train_fn)

    self._replay_state = None
    self._agent_state = None
    self._env_steps = 0
    self._train_steps = 0
    self._session_start_steps = 0
    self._last_loss = float("nan")
    self._stop = threading.Event()
    # Checkpoint coordination: the collector thread pauses the trainer
    # before snapshotting (agent_state, train_steps, trainer_key) so the
    # saved triple is mutually consistent instead of racing a concurrent
    # trainer publish. Generation-stamped: the trainer acknowledges a
    # SPECIFIC pause request (_ack_gen >= _pause_gen), so a stale ack
    # from a previous checkpoint can never satisfy a new one while a
    # device call is still in flight.
    self._pause = threading.Event()
    self._pause_gen = 0
    self._ack_gen = -1
    self._trainer_key = None
    self._trainer_thread: Optional[threading.Thread] = None

  # -- device programs -------------------------------------------------------
  def _collect_fn(self, replay_state, params, host_ts, prev_ts, prev_action,
                  key, insert=True):
    # `insert` is static: tick 0 has no real previous transition — a
    # from_transition(reset_ts, zero_action, reset_ts) frame would plant
    # one fabricated FIRST->FIRST self-transition (with an action never
    # taken) in the valid sampling window of every run.
    if insert:
      frame = tj.from_transition(
          prev_ts, ps.PolicyStep(action=prev_action), host_ts)
      replay_state = self.replay.add_batch(replay_state, frame)
    action_step = self.agent.collect_policy.action(params, host_ts, (), key)
    return replay_state, action_step.action

  def _train_fn(self, agent_state, replay_state, key):
    def train_once(ag, k):
      experience, _ = self.replay.sample(
          replay_state, k, self.sample_batch_size,
          num_steps=self.agent.train_sequence_length)
      ag, loss_info = self.agent.train(ag, experience)
      return ag, loss_info.loss

    ks = jax.random.split(key, self.train_steps_per_call)
    agent_state, losses = jax.lax.scan(train_once, agent_state, ks)
    return agent_state, losses[-1]

  # -- trainer thread ----------------------------------------------------------
  def _trainer_loop(self):
    calls = 0
    while not self._stop.is_set():
      if self._pause.is_set():
        self._ack_gen = self._pause_gen
        time.sleep(0.005)
        continue
      if self._env_steps < self.min_replay_frames:
        time.sleep(0.01)
        continue
      if self.utd_ratio is not None and self._train_steps >= \
          self.utd_ratio * self._env_steps:
        time.sleep(0.001)
        continue
      self._trainer_key, sub = jax.random.split(self._trainer_key)
      agent_state, loss = self._train_prog(
          self._agent_state, self._replay_state, sub)
      self._agent_state = agent_state
      self._train_steps += self.train_steps_per_call
      calls += 1
      # Sync via readback only every 16 calls: value readback is the only
      # real synchronization on this backend and costs a host round trip;
      # in between, the dispatch queue keeps the device pipelined.
      if calls % 16 == 0:
        self._last_loss = float(np.asarray(loss))
    # Final readback on exit: short runs (< 16 trainer calls) would
    # otherwise report last_loss = nan (or, before the per-run reset, a
    # PREVIOUS run's stale value).
    if calls:
      self._last_loss = float(np.asarray(loss))

  # -- checkpointing ---------------------------------------------------------
  def _metric_ckpt(self):
    """Metric state as fixed-shape arrays (orbax templates need stable
    shapes, so deque buffers are padded to their maxlen + a count)."""
    out = []
    for m in self.py_metrics:
      st = m.get_state() if hasattr(m, "get_state") else {}
      if "buffer" in st:
        maxlen = m._buffer._deque.maxlen
        buf = np.zeros((maxlen,), np.float64)
        vals = st["buffer"]
        buf[:len(vals)] = vals
        out.append({"buffer": buf, "n": len(vals)})
      else:
        out.append({"count": int(st.get("count", 0))})
    return tuple(out)

  def _metric_restore(self, saved):
    for m, st in zip(self.py_metrics, saved):
      if not hasattr(m, "set_state"):
        continue
      if "buffer" in st:
        n = int(st["n"])
        m.set_state({"buffer": [float(v) for v in
                                np.asarray(st["buffer"])[:n]]})
      else:
        m.set_state({"count": int(st["count"])})

  def _checkpoint_state(self, tick: int, collect_key):
    return {
        "agent_state": self._agent_state,
        "replay_state": self._replay_state,
        "collect_key": jax.random.key_data(collect_key),
        "trainer_key": jax.random.key_data(self._trainer_key),
        "counters": {"tick": tick, "train_steps": self._train_steps},
        "metrics": self._metric_ckpt(),
    }

  def _save_checkpoint(self, checkpointer, tick: int, collect_key):
    """Pause the trainer, snapshot full training state, save, resume.

    The analogue of the reference Learner's periodic checkpoint trigger
    (tf_agents/train/learner.py:256-263): agent + optimizer + replay +
    counters + RNG streams + metric buffers in ONE atomic orbax save, so
    a preempted run loses nothing but the in-flight host episodes (which
    the reference loses too — its actors restart from env reset,
    learner.py:146-152)."""
    self._pause_gen += 1
    gen = self._pause_gen
    self._pause.set()
    deadline = time.time() + 120  # let an in-flight device call drain
    while time.time() < deadline:
      if self._ack_gen >= gen:
        break
      if self._trainer_thread is None or \
          not self._trainer_thread.is_alive():
        break
      time.sleep(0.005)
    try:
      state = self._checkpoint_state(tick, collect_key)
      checkpointer.save(tick, state)
      checkpointer.wait()
    finally:
      self._pause.clear()

  # -- main -------------------------------------------------------------------
  def run(self, total_env_batch_steps: int, seed: int = 0,
          initial_random_steps: int = 100,
          progress_fn=None, progress_every: int = 1000,
          checkpointer=None, checkpoint_interval_ticks: int = 0,
          resume: bool = False):
    B = self.env.batch_size
    rng = np.random.RandomState(seed)
    # Each run() is a fresh training session: the previous trainer must
    # be FULLY dead before the stop flag is revived — a trainer blocked
    # in a stalled device call (the tunnel's program-load queue can
    # stall minutes) that woke up after a cleared flag would clobber
    # this run's agent state and keep training alongside the new thread.
    if self._trainer_thread is not None and self._trainer_thread.is_alive():
      self._stop.set()
      self._trainer_thread.join()  # wait out any stalled device call
    self._stop.clear()
    self._agent_state = self.agent.init(jax.random.key(seed))
    self._replay_state = self.replay.init()
    # Zero the per-run counters and metric state. (Without this, every
    # run() after the first had a trainer thread that exited instantly
    # on the still-set stop event, carried-over step counters, and
    # metrics mixing episodes across runs — invisible to single-run
    # training binaries, fatal to anything that calls run() twice,
    # e.g. a warmup + timed benchmark probe.)
    self._env_steps = 0
    self._train_steps = 0
    self._last_loss = float("nan")
    self._pause.clear()
    self._ack_gen = self._pause_gen - 1
    for m in self.py_metrics:
      if hasattr(m, "reset"):
        m.reset()
    key = jax.random.key(seed + 1)
    self._trainer_key = jax.random.key(seed + 2)

    start_tick = 0
    if checkpointer is not None and resume and \
        checkpointer.latest_step() is not None:
      template = self._checkpoint_state(0, key)
      try:
        st = checkpointer.restore(template)
      except Exception:
        # Checkpoints written before metric state moved into the orbax
        # tree lack the "metrics" entry; restore the rest.
        st = checkpointer.restore(
            {k: v for k, v in template.items() if k != "metrics"})
      self._agent_state = st["agent_state"]
      self._replay_state = st["replay_state"]
      key = jax.random.wrap_key_data(st["collect_key"])
      self._trainer_key = jax.random.wrap_key_data(st["trainer_key"])
      start_tick = int(st["counters"]["tick"])
      self._env_steps = start_tick * B
      self._train_steps = int(st["counters"]["train_steps"])
      self._metric_restore(st.get("metrics", ()))
    self._session_start_steps = self._env_steps

    time_step = self.env.reset()
    prev_ts = time_step
    prev_action = array_spec.zero_spec_nest(
        self.agent.action_spec, outer_dims=(B,))

    def random_action():
      return array_spec.np_sample_spec_nest(
          self.agent.action_spec, rng, outer_dims=(B,))

    trainer = threading.Thread(
        target=self._trainer_loop, daemon=True)
    self._trainer_thread = trainer
    trainer.start()
    t0 = time.time()
    try:
      for tick in range(start_tick, total_env_batch_steps):
        key, sub = jax.random.split(key)
        params = self.agent.collect_policy_params(self._agent_state)
        # `insert` skips the first tick of THIS session, not just tick 0:
        # after a resume the previous transition is a fresh env reset with
        # a zero action, exactly the fabricated frame the tick-0 skip
        # exists to keep out of the sampling window.
        self._replay_state, action = self._collect_prog(
            self._replay_state, params, time_step, prev_ts, prev_action,
            sub, insert=tick > start_tick)
        if tick * B < initial_random_steps * B and \
            tick < max(initial_random_steps, 1):
          action_np = random_action()
        else:
          action_np = jax.tree_util.tree_map(np.asarray, action)
        next_ts = self.env.step(action_np)
        if self.py_metrics:
          frame = tj.from_transition(
              time_step, ps.PolicyStep(action=action_np), next_ts)
          for m in self.py_metrics:
            m(frame)
        prev_ts, prev_action = time_step, action_np
        time_step = next_ts
        self._env_steps = (tick + 1) * B
        if progress_fn and (tick + 1) % progress_every == 0:
          progress_fn(self)
        if checkpointer is not None and checkpoint_interval_ticks and \
            (tick + 1) % checkpoint_interval_ticks == 0 and \
            (tick + 1) < total_env_batch_steps:
          self._save_checkpoint(checkpointer, tick + 1, key)
    finally:
      self._stop.set()
      trainer.join(timeout=10)
    if checkpointer is not None and checkpoint_interval_ticks and \
        total_env_batch_steps > start_tick:
      # Final-state checkpoint after the trainer drains: a later run with
      # a higher step target resumes from here instead of the last
      # interval (and a completed run restores to its exact end state).
      self._save_checkpoint(checkpointer, total_env_batch_steps, key)
    # If the trainer is still draining a stalled device call, the
    # last_loss/train_steps below may lag the dispatched work; the flag
    # lets callers distinguish that from a clean drain rather than
    # blocking run() on an unbounded device stall (the next run() does
    # the full join before reusing the loop).
    return {
        "env_steps": self._env_steps,
        "train_steps": self._train_steps,
        "wall_s": time.time() - t0,
        "last_loss": self._last_loss,
        "trainer_drained": not trainer.is_alive(),
        "metrics": {m.name: m.result() for m in self.py_metrics},
        "agent_state": self._agent_state,
    }
