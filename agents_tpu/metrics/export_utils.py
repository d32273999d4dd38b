"""Metric export helpers (reference metrics/export_utils.py:21)."""
from __future__ import annotations

import logging
from typing import Optional, Sequence


def export_metrics(step: int, metrics: Sequence, summary_writer=None,
                   prefix: str = "") -> dict:
  """Logs metric results and optionally writes them to a summary writer."""
  results = {}
  for m in metrics:
    name = f"{prefix}/{m.name}" if prefix else m.name
    value = float(m.result())
    results[name] = value
    if summary_writer is not None:
      summary_writer.scalar(name, value, step)
  logging.info("step %d: %s", step, results)
  return results
