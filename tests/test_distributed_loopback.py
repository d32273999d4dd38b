"""Two-process loopback smoke for parallel.distributed.initialize.

The reference exercises its cluster plumbing through real multi-worker
jobs (strategy_utils + reverb variable container); the analogous minimum
here is: two OS processes rendezvous through jax.distributed on
localhost, agree on process_count, and each contributes its local
devices to the global device list. Guarded by a capability probe — some
sandboxes block the distributed service entirely — but when the runtime
is available this actually executes the DCN-rendezvous code path that
`examples/sac_{collect,train}_job.py` rely on.
"""
import multiprocessing as mp
import os
import socket
import sys

import pytest


def _free_port() -> int:
  s = socket.socket()
  s.bind(("127.0.0.1", 0))
  port = s.getsockname()[1]
  s.close()
  return port


def _worker(port, rank, q):
  # Isolated single-CPU-device JAX in each process; no TPU plugin.
  os.environ["PALLAS_AXON_POOL_IPS"] = ""
  os.environ["JAX_PLATFORMS"] = "cpu"
  os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
  try:
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from agents_tpu.parallel import distributed
    import jax

    ok = distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2, process_id=rank)
    n_proc = jax.process_count()
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    local, off = distributed.process_local_batch_slice(8)
    q.put((rank, ok, n_proc, n_global, n_local, local, off))
  except Exception as e:  # capability probe: report, don't hang
    q.put((rank, "error", repr(e)))


def test_two_process_loopback_initialize():
  ctx = mp.get_context("spawn")
  port = _free_port()
  q = ctx.Queue()
  procs = [ctx.Process(target=_worker, args=(port, r, q)) for r in (0, 1)]
  for p in procs:
    p.start()
  results = []
  try:
    for _ in procs:
      results.append(q.get(timeout=90))
  finally:
    for p in procs:
      p.join(timeout=30)
      if p.is_alive():
        p.terminate()

  errors = [r for r in results if r[1] == "error"]
  if errors:
    pytest.skip(f"distributed runtime unavailable in sandbox: {errors}")

  by_rank = {r[0]: r for r in results}
  assert set(by_rank) == {0, 1}
  for rank, ok, n_proc, n_global, n_local, local, off in results:
    assert ok is True
    assert n_proc == 2
    assert n_local == 2
    assert n_global == 4          # both processes' devices visible
    assert local == 4             # 8-global batch split across 2 hosts
  assert by_rank[0][6] == 0 and by_rank[1][6] == 4   # disjoint slices
