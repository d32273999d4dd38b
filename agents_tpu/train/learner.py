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
               summary_writer=None):
    self.root_dir = root_dir
    self.train_dir = os.path.join(root_dir, TRAIN_DIR)
    os.makedirs(self.train_dir, exist_ok=True)
    self.loop = loop
    self._train_fn = train_fn or (lambda s, n: loop.run(s, n))
    self._jitted = jax.jit(self._train_fn, static_argnums=1)
    self.state = initial_state
    self.triggers = list(triggers)
    self.summary_writer = summary_writer
    self.global_step = 0
    self._tracker = StepPerSecondTracker()

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
      self._ckpt_trigger = IntervalTrigger(
          checkpoint_interval,
          lambda: self.checkpointer.save(self.global_step, self.state))

  def run(self, iterations: int = 1):
    """Run `iterations` fused train iterations; returns last loss."""
    self.state, losses = self._jitted(self.state, iterations)
    self.global_step += iterations
    loss = float(np.asarray(losses)[-1]) if np.ndim(losses) else float(losses)
    for trig in self.triggers:
      trig(self.global_step)
    if self._ckpt_trigger is not None:
      self._ckpt_trigger(self.global_step)
    if self.summary_writer is not None:
      self.summary_writer.scalar("loss", loss, self.global_step)
    return loss

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

  def close(self):
    self._f.close()
