"""Shared-memory variable container (native/varstore/varstore.cc).

Covers the ReverbVariableContainer surface (push/pull/step with
structure checking) plus the property gRPC gave the reference for free:
readers in OTHER PROCESSES always see a consistent (untorn) snapshot
while the writer keeps publishing.
"""
import multiprocessing as mp
import os

import numpy as np
import pytest

from agents_tpu.train.variable_container import VariableContainer


def _template():
  return {"dense": {"kernel": np.zeros((4, 3), np.float32),
                    "bias": np.zeros((3,), np.float32)},
          "step_scale": np.zeros((), np.int32)}


def _params(v):
  return {"dense": {"kernel": np.full((4, 3), v, np.float32),
                    "bias": np.full((3,), v * 2, np.float32)},
          "step_scale": np.asarray(v, np.int32)}


def test_push_pull_roundtrip():
  name = f"vc_test_{os.getpid()}"
  with VariableContainer(name, _template(), create=True) as vc:
    assert vc.pull() is None and vc.step() == -1
    vc.push(_params(7), step=42)
    got, step = vc.pull()
    assert step == 42 and vc.step() == 42
    np.testing.assert_array_equal(got["dense"]["kernel"],
                                  np.full((4, 3), 7, np.float32))
    np.testing.assert_array_equal(got["dense"]["bias"],
                                  np.full((3,), 14, np.float32))
    assert int(got["step_scale"]) == 7
    # Latest-wins.
    vc.push(_params(9), step=43)
    got, step = vc.pull()
    assert step == 43 and int(got["step_scale"]) == 9
    assert vc.writes() == 2


def test_structure_mismatch_rejected():
  name = f"vc_test_bad_{os.getpid()}"
  with VariableContainer(name, _template(), create=True) as vc:
    with pytest.raises(ValueError):
      vc.push({"just_one_leaf": np.zeros((2,), np.float32)}, step=0)


def _reader_proc(name, n_pulls, q):
  tmpl = _template()
  vc = VariableContainer(name, tmpl, create=False)
  bad = 0
  max_step = -1
  pulled = 0
  while pulled < n_pulls:
    out = vc.pull()
    if out is None:
      continue
    params, step = out
    pulled += 1
    # Consistency invariant: all leaves were written together, so the
    # value relationships must hold exactly — a torn read breaks them.
    v = float(params["dense"]["kernel"][0, 0])
    if not (params["dense"]["kernel"] == v).all():
      bad += 1
    elif not (params["dense"]["bias"] == 2 * v).all():
      bad += 1
    elif int(params["step_scale"]) != int(v):
      bad += 1
    elif step != int(v):           # writer publishes step == v
      bad += 1
    if step < max_step:            # steps must be monotone (latest-wins)
      bad += 1
    max_step = max(max_step, step)
  vc.close()
  q.put((bad, max_step))


def test_concurrent_cross_process_reads_never_tear():
  name = f"vc_test_mp_{os.getpid()}"
  tmpl = _template()
  vc = VariableContainer(name, tmpl, create=True)
  try:
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    readers = [ctx.Process(target=_reader_proc, args=(name, 200, q))
               for _ in range(2)]
    vc.push(_params(0), step=0)
    for r in readers:
      r.start()
    for v in range(1, 2000):
      vc.push(_params(v), step=v)
    results = [q.get(timeout=60) for _ in readers]
    for r in readers:
      r.join(timeout=30)
    for bad, max_step in results:
      assert bad == 0, f"{bad} torn/inconsistent snapshots"
      assert 0 <= max_step < 2000
  finally:
    vc.close()
    vc.unlink()


def test_distributed_job_set_with_shm_weights(tmp_path):
  """End-to-end wiring: sac_train_job --smoke spawns a collect job, both
  sides exchange experience over the ingest ring AND weights over the
  shm variable container; the collector must report a policy step
  pulled from shm (not the file-poll path)."""
  import json
  import subprocess
  import sys

  repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  env = dict(os.environ)
  env.pop("PALLAS_AXON_POOL_IPS", None)
  env["PALLAS_AXON_POOL_IPS"] = ""
  env["JAX_PLATFORMS"] = "cpu"
  env.pop("XLA_FLAGS", None)
  shm = f"vc_jobs_{os.getpid()}"
  proc = subprocess.run(
      [sys.executable, os.path.join(repo, "examples", "sac_train_job.py"),
       "--smoke", f"--root_dir={tmp_path}", f"--rings=ring_{os.getpid()}",
       f"--weights_shm={shm}", "--export_interval_steps=50"],
      env=env, capture_output=True, text=True, timeout=420, cwd=repo)
  assert proc.returncode == 0, proc.stderr[-2000:]
  done = [json.loads(l) for l in proc.stdout.splitlines()
          if '"done": true' in l and '"train"' in l]
  assert done and done[0]["items_ingested"] > 0
  assert done[0]["train_steps"] >= 200
