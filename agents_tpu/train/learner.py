"""Learner: host-side orchestration of jitted training.

Analogue of ``tf_agents/train/learner.py:42``. The reference Learner owns
a tf.distribute strategy, a tf.data iterator over Reverb, checkpointing,
and summary gating. Here the heavy lifting is already fused on-device
(FusedTrainLoop / OnPolicyTrainLoop / HostDeviceTrainLoop); the Learner
adds the production shell: root_dir layout (TRAIN_DIR/policies constants,
reference :30-40), checkpoint restore/save cadence (:256), triggers, and
steps/sec accounting.
"""
from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Callable, Optional, Sequence

import jax
import numpy as np

from agents_tpu.train.checkpointer import Checkpointer
from agents_tpu.train.triggers import IntervalTrigger, StepPerSecondTracker

TRAIN_DIR = "train"
POLICY_SAVED_MODEL_DIR = "policies"
GREEDY_POLICY_SAVED_MODEL_DIR = "greedy_policy"
COLLECT_POLICY_SAVED_MODEL_DIR = "collect_policy"


class Learner:
  """Args:
    root_dir: experiment directory (checkpoints under root/train).
    loop: an object with `.run(state, n) -> (state, losses)` and an
      initial state (FusedTrainLoop-style), or pass `train_fn`.
    initial_state: the loop state pytree.
    train_fn: alternative to `loop` — (state, n) -> (state, losses).
    triggers: sequence of IntervalTrigger-likes called with the global
      step after each `run`.
    checkpoint_interval: steps between checkpoints; <=0 disables (the
      reference warns loudly when disabled, learner.py:146-152).
  """

  def __init__(self, root_dir: str, loop=None, initial_state=None,
               train_fn: Optional[Callable] = None,
               triggers: Sequence = (),
               checkpoint_interval: int = 100_000,
               steps_per_run_call: int = 1,
               summary_writer=None,
               summary_interval: int = 100,
               extra_summary_fn: Optional[Callable] = None):
    self.root_dir = root_dir
    self.train_dir = os.path.join(root_dir, TRAIN_DIR)
    os.makedirs(self.train_dir, exist_ok=True)
    self.loop = loop
    # Prefer the loop's info-returning path so loss extras reach
    # summaries (the reference writes agent loss components under its
    # summary gate, train/learner.py:285-292).
    self._with_info = train_fn is None and hasattr(loop, "run_with_info")
    if train_fn is not None:
      self._train_fn = train_fn
    elif self._with_info:
      self._train_fn = lambda s, n: loop.run_with_info(s, n)
    else:
      self._train_fn = lambda s, n: loop.run(s, n)
    self._jitted = jax.jit(self._train_fn, static_argnums=1)
    self.state = initial_state
    self.triggers = list(triggers)
    # One fused loop iteration may run several gradient steps (e.g. a
    # train_steps_per_tick scan); global_step advances by
    # iterations * steps_per_run_call so checkpoint/summary triggers and
    # resumed step numbers track actual gradient steps.
    self.steps_per_run_call = int(steps_per_run_call)
    self.summary_writer = summary_writer
    self.summary_interval = summary_interval
    self.extra_summary_fn = extra_summary_fn
    self.global_step = 0
    self._tracker = StepPerSecondTracker()
    self._summary_trigger = IntervalTrigger(
        max(summary_interval, 1), self._write_summaries)
    self._last_info = None

    if checkpoint_interval <= 0:
      logging.warning(
          "Checkpointing disabled: if the pipeline gets preempted, all "
          "previous progress is lost (reference learner.py:146).")
      self.checkpointer = None
      self._ckpt_trigger = None
    else:
      self.checkpointer = Checkpointer(
          os.path.join(self.train_dir, "checkpoints"))
      self.state = self.checkpointer.initialize_or_restore(self.state)
      latest = self.checkpointer.latest_step()
      if latest:
        self.global_step = latest
        # Re-baseline the throughput tracker: leaving it at step 0 makes
        # the first steps_per_sec summary report (restored_step -
        # 0) / process_age — a bogus spike after every resume.
        self._tracker.restart(self.global_step)
      self._ckpt_trigger = IntervalTrigger(
          checkpoint_interval,
          lambda: self.checkpointer.save(self.global_step, self.state))

  def run(self, iterations: int = 1):
    """Run `iterations` fused train iterations; returns last loss."""
    self.state, out = self._jitted(self.state, iterations)
    self.global_step += iterations * self.steps_per_run_call
    if self._with_info:
      self._last_info = jax.tree_util.tree_map(lambda x: x[-1], out)
      losses = out.loss
    else:
      self._last_info = None
      losses = out
    loss = float(np.asarray(losses)[-1]) if np.ndim(losses) else float(losses)
    self._last_loss = loss
    for trig in self.triggers:
      trig(self.global_step)
    if self._ckpt_trigger is not None:
      self._ckpt_trigger(self.global_step)
    if self.summary_writer is not None:
      self._summary_trigger(self.global_step)
    return loss

  def _write_summaries(self):
    """Emit loss, loss extras, collect metrics, and steps/sec — the full
    observability set the reference gates per summary_interval
    (train/learner.py:285-292 + Actor.write_metric_summaries)."""
    w = self.summary_writer
    step = self.global_step
    w.scalar("loss", self._last_loss, step)
    if self._last_info is not None:
      extra = self._last_info.extra
      leaves_with_paths = jax.tree_util.tree_flatten_with_path(extra)[0]
      for path, leaf in leaves_with_paths:
        name = "loss_extra/" + "/".join(
            str(getattr(p, "name", getattr(p, "key", getattr(p, "idx", p))))
            for p in path) if path else "loss_extra"
        val = np.asarray(jax.device_get(leaf))
        w.scalar(name, float(val.mean()), step)
    if self.loop is not None and hasattr(self.loop, "results"):
      # Count-vector metrics (ChosenActionHistogram, reference
      # metrics/tf_metrics.py:369) -> TB histogram. Routed by the
      # metric's declared result_kind, never by name: a 1-D vector of
      # continuous values (quantiles, per-row returns) encoded as
      # bucket counts would render nonsense.
      kinds = {m.name: getattr(m, "result_kind", "scalar")
               for m in getattr(self.loop, "metrics", ())}
      for name, val in self.loop.results(self.state).items():
        v = np.asarray(jax.device_get(val))
        if v.ndim == 0:
          w.scalar("collect/" + name, float(v), step)
        elif (v.ndim == 1 and kinds.get(name) == "counts"
              and hasattr(w, "histogram_from_counts")):
          w.histogram_from_counts("collect/" + name, v, step)
        elif v.ndim == 1:
          # Vector metrics that are NOT bucket counts (e.g. the
          # multi-objective AverageReturnMultiMetric): per-component
          # scalars, so the metric is never silently dropped.
          for i, comp in enumerate(v):
            w.scalar(f"collect/{name}/{i}", float(comp), step)
    sps = self._tracker.steps_per_second(step)
    self._tracker.restart(step)
    w.scalar("steps_per_sec", sps, step)
    if self.extra_summary_fn is not None:
      for name, val in self.extra_summary_fn(self.state).items():
        w.scalar(name, float(val), step)

  def steps_per_second(self):
    sps = self._tracker.steps_per_second(self.global_step)
    self._tracker.restart(self.global_step)
    return sps

  def checkpoint(self, force: bool = True):
    if self.checkpointer:
      self.checkpointer.save(self.global_step, self.state, force=force)


class JsonlSummaryWriter:
  """Minimal metric logger (the TensorBoard-summary analogue): one JSON
  line per scalar, tail-able and machine-readable."""

  def __init__(self, path: str):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    self._f = open(path, "a")

  def scalar(self, name: str, value: float, step: int):
    self._f.write(json.dumps(
        {"step": int(step), name: float(value), "t": time.time()}) + "\n")
    self._f.flush()

  def histogram_from_counts(self, name: str, counts, step: int,
                            limits=None):
    rec = {"step": int(step), name: [float(c) for c in np.asarray(counts)],
           "t": time.time()}
    if limits is not None:
      rec[name + "/limits"] = [float(x) for x in np.asarray(limits)]
    self._f.write(json.dumps(rec) + "\n")
    self._f.flush()

  def close(self):
    self._f.close()
