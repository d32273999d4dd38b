"""Provenance checks on the round-3 committed run artifacts (results/):
long-horizon SAC, multi-seed SAC/DQN, the PPO MuJoCo curve, and the
offline CQL pipeline — the reference's published proof points
(BASELINE.md; tf_agents/benchmark/{sac,ppo}_benchmark.py,
examples/{sac,ppo,cql_sac}/README.md)."""
import json
import os

import numpy as np
import pytest

from agents_tpu.benchmark.return_windows import (PPO_HALFCHEETAH_WINDOWS,
                                                 SAC_HALFCHEETAH_WINDOWS,
                                                 check_windows,
                                                 read_jsonl_returns)

BASE = os.path.join(os.path.dirname(__file__), "..", "results")


def _landed(*fnames):
  """In-round gate: artifacts land one by one as the live runs finish;
  once committed they are in git and the corresponding test is
  permanent."""
  missing = [f for f in fnames
             if not os.path.exists(os.path.join(BASE, f))]
  if missing:
    pytest.skip(f"artifact(s) not landed yet: {missing}")


def _evals(path):
  out = []
  with open(path) as f:
    for line in f:
      rec = json.loads(line)
      if "EvalAverageReturn" in rec:
        out.append((int(rec["step"]), float(rec["EvalAverageReturn"])))
  return out


def test_sac_halfcheetah_3m_passes_perfzero_window():
  """The 3M-step run must land inside the reference's hard window
  [12000, 16500] (sac_benchmark.py:64-75) — greedy 30-episode evals."""
  _landed("sac_halfcheetah_3m_s0.jsonl")
  evals = _evals(os.path.join(BASE, "sac_halfcheetah_3m_s0.jsonl"))
  assert evals, "no greedy-eval points in 3M artifact"
  final_step, final_eval = evals[-1]
  assert final_step >= 2_900_000
  assert 12_000.0 <= final_eval <= 16_500.0, (final_step, final_eval)
  # 1M checkpoint of the same run inside the 1M window too.
  near_1m = min(evals, key=lambda p: abs(p[0] - 1_000_000))
  assert 800.0 <= near_1m[1] <= 16_000.0, near_1m


def test_sac_halfcheetah_multi_seed_1m():
  """Three seeds at 1M: every seed inside the PerfZero 1M window, and the
  seed mean within normal variance of the reference's published mean
  12,096 (examples/sac/README.md:62; theirs is a 4-5 seed mean on
  HalfCheetah-v2, ours on v5)."""
  _landed("sac_halfcheetah_1m_s1.jsonl", "sac_halfcheetah_1m_s2.jsonl")
  finals = []
  for fname in ("sac_halfcheetah_1m_utd1_eval.jsonl",  # round-2 seed 0
                "sac_halfcheetah_1m_s1.jsonl",
                "sac_halfcheetah_1m_s2.jsonl"):
    evals = _evals(os.path.join(BASE, fname))
    assert evals, f"no eval points in {fname}"
    step, ret = evals[-1]
    assert step >= 990_000, (fname, step)
    assert 800.0 <= ret <= 16_000.0, (fname, ret)
    finals.append(ret)
  mean = float(np.mean(finals))
  lo, hi = min(finals), max(finals)
  # The reference mean must be inside (or below) our seed range
  # neighborhood: mean within 25% of 12,096 and the range bracketing it
  # or the mean beating it.
  assert mean > 0.75 * 12_096, (finals, mean)
  assert lo - 2_000 <= 12_096 <= hi + 2_000 or mean >= 12_096, (finals,
                                                                mean)


def test_ppo_halfcheetah_1m_curve():
  """PPO-Clip at the schulman17 operating point to ~1M transitions:
  inside the PerfZero hard window [2400, 7000] at 1M
  (ppo_benchmark.py:58); reference mean 4,239 (ppo/README.md:46-48)."""
  import glob
  _landed("ppo_halfcheetah_1m_s0.jsonl")
  paths = sorted(glob.glob(os.path.join(BASE, "ppo_halfcheetah_1m_s*.jsonl")))
  for path in paths:
    points = read_jsonl_returns(path)
    assert len(points) >= 20, path
    result = check_windows(points, PPO_HALFCHEETAH_WINDOWS)
    assert result[1_000_000], (path, points[-3:])
    evals = _evals(path)
    assert evals and 2_400.0 <= evals[-1][1] <= 7_000.0, (path, evals[-3:])
    # It genuinely learned: early curve far below the final.
    assert points[0][1] < 1_000, (path, points[:3])


def test_dqn_cartpole_multi_seed_solved():
  """Reference BASELINE config (train_eval.py:94-127) at 3 seeds: every
  seed must SOLVE CartPole (collect window reaches 200) and hold a high
  late-training level. DQN CartPole oscillates late in training (the
  reference's own tutorial curves dip below 195 after solving), so the
  per-seed criterion is solved + late-curve floor, with the greedy-eval
  mean across seeds also held high."""
  _landed(*[f"dqn_cartpole_s{s}.jsonl" for s in (0, 1, 2)])
  final_evals = []
  for seed in (0, 1, 2):
    path = os.path.join(BASE, f"dqn_cartpole_s{seed}.jsonl")
    points = read_jsonl_returns(path)
    assert len(points) >= 40, (seed, len(points))
    assert max(p[1] for p in points) >= 199.0, (seed, "never solved")
    late = [p[1] for p in points[-5:]]
    assert min(late) >= 150.0, (seed, late)
    evals = _evals(path)
    assert evals, f"no eval points for seed {seed}"
    final_evals.append(evals[-1][1])
  assert float(np.mean(final_evals)) >= 175.0, final_evals


def test_cql_offline_recovers_dataset_policy():
  """Offline CQL (kumar20 pipeline on a self-generated dataset) must
  recover the data-generating policy's quality — the D4RL convention
  (cql_sac/README.md scores offline runs against the dataset policy's
  level, not the greedy behavior optimum)."""
  _landed("cql_sac_offline_halfcheetah.jsonl")
  path = os.path.join(BASE, "cql_sac_offline_halfcheetah.jsonl")
  dataset_ret, offline = None, []
  with open(path) as f:
    for line in f:
      rec = json.loads(line)
      if "dataset_policy_return" in rec:
        dataset_ret = float(rec["dataset_policy_return"])
      if "offline_eval_return" in rec:
        offline.append(float(rec["offline_eval_return"]))
  assert dataset_ret is not None and offline
  assert max(offline) >= 0.9 * dataset_ret, (dataset_ret, max(offline))


def test_sac_hopper_walker_curves():
  """SAC at the haarnoja18 operating point on the other published MuJoCo
  tasks: Hopper (reference mean 3,323 @ 1M, examples/sac/README.md:63)
  and Walker2d (4,966 @ 1M, :64). Reference values are 4-5-seed means on
  v2 envs with wide seed scatter; a single v5 seed must land within the
  normal band (>= 60% of the mean) and clearly above random."""
  cases = (("sac_hopper_1m_s0.jsonl", 3_323.0),
           ("sac_walker2d_1m_s0.jsonl", 4_966.0))
  _landed(*[c[0] for c in cases])
  for fname, ref_mean in cases:
    evals = _evals(os.path.join(BASE, fname))
    assert evals, f"no eval points in {fname}"
    step, ret = evals[-1]
    assert step >= 990_000, (fname, step)
    assert ret >= 0.6 * ref_mean, (fname, ret, ref_mean)
