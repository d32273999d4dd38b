"""PolicyStep pytree: (action, state, info).

Analogue of ``tf_agents/trajectories/policy_step.py:31``.
"""
from __future__ import annotations

from typing import Any

from flax import struct


@struct.dataclass
class PolicyStep:
  action: Any = ()
  state: Any = ()
  info: Any = ()


@struct.dataclass
class PolicyInfo:
  """Standard info payload; `log_probability` mirrors reference
  ``policy_step.set_log_probability`` (:116)."""
  log_probability: Any = ()


def set_log_probability(info, log_probability):
  if info == () or info is None:
    return PolicyInfo(log_probability=log_probability)
  if isinstance(info, PolicyInfo):
    return info.replace(log_probability=log_probability)
  if isinstance(info, dict):
    out = dict(info)
    out["log_probability"] = log_probability
    return out
  raise TypeError(f"Cannot set log_probability on info of type {type(info)}")


def get_log_probability(info):
  if isinstance(info, PolicyInfo):
    return info.log_probability
  if isinstance(info, dict):
    return info["log_probability"]
  raise TypeError(f"No log_probability in info of type {type(info)}")
