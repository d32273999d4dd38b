"""Checkpoint/restore for pytree training state via orbax.

Analogue of ``tf_agents/utils/common.py:1045`` (Checkpointer wrapping
tf.train.CheckpointManager): keeps the last `max_to_keep` checkpoints,
`initialize_or_restore` (:1087) restores the latest if present.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class Checkpointer:

  def __init__(self, ckpt_dir: str, max_to_keep: int = 3):
    self._dir = os.path.abspath(ckpt_dir)
    os.makedirs(self._dir, exist_ok=True)
    self._mngr = ocp.CheckpointManager(
        self._dir,
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True))

  @property
  def manager(self):
    return self._mngr

  @property
  def directory(self) -> str:
    return self._dir

  def save(self, step: int, state: Any, force: bool = False) -> bool:
    if int(step) in (self._mngr.all_steps() or []):
      return False
    saved = self._mngr.save(
        int(step), args=ocp.args.StandardSave(state), force=force)
    return saved

  def wait(self):
    self._mngr.wait_until_finished()

  def latest_step(self) -> Optional[int]:
    return self._mngr.latest_step()

  def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
    step = self._mngr.latest_step() if step is None else step
    if step is None:
      raise FileNotFoundError(f"No checkpoint in {self._dir}")
    return self._mngr.restore(
        step, args=ocp.args.StandardRestore(state_template))

  def initialize_or_restore(self, state_template: Any) -> Any:
    """Restore latest if any, else return the template unchanged
    (reference :1087)."""
    if self._mngr.latest_step() is None:
      return state_template
    return self.restore(state_template)

  def close(self):
    self._mngr.close()
