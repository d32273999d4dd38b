"""Multi-host initialization and distributed helpers.

Analogue of the reference's cluster plumbing (strategy_utils.get_strategy
:27-61 + the Reverb variable container). On TPU pods:

  - `initialize()` wraps jax.distributed.initialize (DCN rendezvous);
    after it, `jax.devices()` spans the pod and the same pjit programs
    scale — data-parallel gradients ride ICI automatically.
  - Weight distribution needs no variable container: parameters are
    replicated device arrays inside the jitted program.
  - `process_local_batch_slice` carves the global env batch across hosts
    (each host steps its own simulators; the analogue of N Actor jobs).
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
  """Multi-host rendezvous; no-op for single-process runs.

  Env-var driven like the reference binaries' flags
  (sac_collect.py:40-60): COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID.
  """
  coordinator_address = coordinator_address or os.environ.get(
      "COORDINATOR_ADDRESS")
  if coordinator_address is None:
    return False
  num_processes = num_processes or int(os.environ.get("NUM_PROCESSES", "1"))
  process_id = process_id if process_id is not None else int(
      os.environ.get("PROCESS_ID", "0"))
  jax.distributed.initialize(coordinator_address, num_processes, process_id)
  return True


def process_local_batch_slice(global_batch: int) -> Tuple[int, int]:
  """(local_batch, offset) for this host's share of the env batch."""
  n = jax.process_count()
  i = jax.process_index()
  if global_batch % n:
    raise ValueError(f"global batch {global_batch} not divisible by {n}")
  local = global_batch // n
  return local, i * local


def staleness_metric(collect_params_step, train_step):
  """Collect-policy-vs-train-step lag (the reference's staleness metrics,
  train_utils.create_staleness_metrics_after_train_step_fn :49-120)."""
  return int(train_step) - int(collect_params_step)
