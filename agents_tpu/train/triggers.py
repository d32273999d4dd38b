"""Training triggers.

Analogues of ``tf_agents/train/interval_trigger.py:23`` (IntervalTrigger)
and ``train/triggers.py`` (PolicySavedModelTrigger :40,
StepPerSecondLogTrigger :201) plus the steps/sec tracker
(step_per_second_tracker.py).
"""
from __future__ import annotations

import logging
import os
import time
from typing import Callable, Optional


class IntervalTrigger:
  """Fires `fn` every `interval` steps (reference interval_trigger.py:23)."""

  def __init__(self, interval: int, fn: Callable[[], None]):
    if interval <= 0:
      raise ValueError("interval must be > 0")
    self.interval = interval
    self.fn = fn
    self._last = 0

  def __call__(self, step: int, force: bool = False):
    if force or (step - self._last) >= self.interval:
      self._last = step - (step % self.interval)
      self.fn()
      return True
    return False

  def reset(self):
    self._last = 0

  def set_start(self, start: int):
    self._last = start


class StepPerSecondTracker:
  """reference step_per_second_tracker.py:44."""

  def __init__(self):
    self.restart(0)

  def restart(self, step: int):
    self._t0 = time.time()
    self._step0 = step

  def steps_per_second(self, step: int) -> float:
    dt = time.time() - self._t0
    return (step - self._step0) / dt if dt > 0 else 0.0


class StepPerSecondLogTrigger(IntervalTrigger):
  """reference triggers.py:201."""

  def __init__(self, get_step: Callable[[], int], interval: int,
               log_fn=logging.info):
    self._get_step = get_step
    self._tracker = StepPerSecondTracker()
    self._log = log_fn

    def _fire():
      step = self._get_step()
      sps = self._tracker.steps_per_second(step)
      self._tracker.restart(step)
      self._log(f"step {step}: {sps:.1f} steps/s")

    super().__init__(interval, _fire)


class PolicyCheckpointTrigger(IntervalTrigger):
  """Exports the greedy/collect/raw policy trio + agent checkpoint every
  N steps — the PolicySavedModelTrigger analogue (reference triggers.py:40,
  which exports greedy_policy/, collect_policy/, policy/ and checkpoints/).
  Each directory is a self-contained artifact when the policy serializes
  (policies/registry.py): a fresh process restores with load_policy(dir)
  alone."""

  def __init__(self, root_dir: str, agent, get_agent_state: Callable,
               interval: int, checkpointer=None):
    from agents_tpu.policies.policy_saver import PolicySaver
    self.root_dir = root_dir
    self.agent = agent
    self.get_agent_state = get_agent_state
    self.checkpointer = checkpointer
    self._saver_cls = PolicySaver

    self._exported_once = set()

    def _fire():
      agent_state = self.get_agent_state()
      step = int(agent_state.train_step)
      # Raw = the unwrapped distribution policy underneath the greedy
      # wrapper (the reference's `policy` export; agent.policy there is
      # raw and greedy is a wrapper — here agent.policy is already the
      # greedy wrapper, so raw is its wrapped policy).
      raw = getattr(self.agent.policy, "wrapped", self.agent.policy)
      exports = (
          ("greedy_policy", self.agent.policy,
           self.agent.policy_params(agent_state)),
          ("collect_policy", self.agent.collect_policy,
           self.agent.collect_policy_params(agent_state)),
          ("policy", raw, self.agent.policy_params(agent_state)),
      )
      for name, policy, params in exports:
        saver = self._saver_cls(policy, train_step=step)
        out_dir = os.path.join(root_dir, "policies", name)
        if name in self._exported_once:
          # Params-only refresh: the StableHLO module takes params as
          # arguments, so repeated triggers never re-trace/re-export
          # (the reference's checkpoint-only trigger updates,
          # triggers.py:40 save_fingerprint path).
          saver.save_checkpoint(out_dir, params)
        else:
          saver.save(out_dir, params)
          self._exported_once.add(name)
      if self.checkpointer is not None:
        self.checkpointer.save(step, agent_state)

    super().__init__(interval, _fire)
