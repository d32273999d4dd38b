"""Training coordination utilities.

Analogues of ``tf_agents/train/utils/train_utils.py``:
wait_for_file (:170), wait_for_policy (:122), wait_for_predicate (:200),
create_train_step (:39) and spec_utils.get_tensor_specs (:23).
"""
from __future__ import annotations

import glob
import os
import time
from typing import Callable, Optional


def wait_for_predicate(predicate: Callable[[], bool],
                       sleep_time_secs: float = 0.5,
                       timeout_secs: Optional[float] = 60.0) -> bool:
  """Polls until predicate() or timeout (reference :200)."""
  t0 = time.time()
  while not predicate():
    if timeout_secs is not None and time.time() - t0 > timeout_secs:
      return False
    time.sleep(sleep_time_secs)
  return True


def wait_for_file(file_pattern: str, sleep_time_secs: float = 0.5,
                  timeout_secs: Optional[float] = 60.0) -> Optional[str]:
  """Waits for a file matching the pattern (reference :170)."""
  found = []

  def check():
    found[:] = glob.glob(file_pattern)
    return bool(found)

  if wait_for_predicate(check, sleep_time_secs, timeout_secs):
    return sorted(found)[-1]
  return None


def wait_for_policy(policy_dir: str, sleep_time_secs: float = 0.5,
                    timeout_secs: Optional[float] = 60.0):
  """Waits for an exported policy and loads its manifest path
  (reference :122 — the eval-job polling pattern,
  examples/eval_job.py:207)."""
  manifest = wait_for_file(
      os.path.join(policy_dir, "policy_manifest.json"),
      sleep_time_secs, timeout_secs)
  return os.path.dirname(manifest) if manifest else None


def get_specs_from_env(env):
  """(observation, action, time_step) specs (spec_utils.get_tensor_specs
  :23)."""
  return env.observation_spec(), env.action_spec(), env.time_step_spec()
