"""PerfZero-style return-window regression harness.

Analogue of ``tf_agents/benchmark/`` (PerfZeroBenchmark :29 and the
per-task pass windows: dqn_benchmark.py:57-73, sac_benchmark.py:64-75,
cql_sac_benchmark.py:77-81): a benchmark run produces (step, return)
points; `check_windows` asserts each configured step's return lies inside
its [min, max] window. Event-log extraction (reference utils.py:230-330)
reads the JsonlSummaryWriter stream.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Dict, List, Optional, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class ReturnWindow:
  step: int
  min_return: float
  max_return: float
  tolerance_steps: int = 0  # accept the closest point within +- this


# Reference pass windows (BASELINE.md / tf_agents/benchmark/*):
SAC_HALFCHEETAH_WINDOWS = (
    ReturnWindow(1_000_000, 800.0, 16_000.0),
    ReturnWindow(3_000_000, 12_000.0, 16_500.0),
)
DQN_PONG_WINDOWS = (ReturnWindow(3_000_000, -14.0, 21.0),)
CQL_HALFCHEETAH_MEDIUM_WINDOWS = (ReturnWindow(500_000, 4400.0, 5400.0),)
# Ours: DQN CartPole must be solved quickly on-device.
DQN_CARTPOLE_WINDOWS = (ReturnWindow(64_000, 195.0, 200.0),)


def read_jsonl_returns(path: str, key: str = "AverageReturn"
                       ) -> List[Tuple[int, float]]:
  """Extract (step, return) from a JsonlSummaryWriter log (the event-log
  extraction analogue)."""
  points = []
  with open(path) as f:
    for line in f:
      try:
        rec = json.loads(line)
      except json.JSONDecodeError:
        continue
      if key in rec:
        points.append((int(rec["step"]), float(rec[key])))
  return points


def check_windows(points: Sequence[Tuple[int, float]],
                  windows: Sequence[ReturnWindow]) -> Dict[int, bool]:
  """For each window pick the nearest-step point and test membership."""
  results = {}
  for w in windows:
    if not points:
      results[w.step] = False
      continue
    step, ret = min(points, key=lambda p: abs(p[0] - w.step))
    if w.tolerance_steps and abs(step - w.step) > w.tolerance_steps:
      results[w.step] = False
      continue
    results[w.step] = w.min_return <= ret <= w.max_return
  return results


def assert_windows(points, windows, name: str = "benchmark"):
  results = check_windows(points, windows)
  failed = {k: v for k, v in results.items() if not v}
  if failed:
    raise AssertionError(
        f"{name}: return windows failed at steps {sorted(failed)}; "
        f"points={list(points)[-5:]}")
  return True
