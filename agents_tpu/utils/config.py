"""Dataclass config system with CLI overrides.

The reference wires every binary through gin (`@gin.configurable`, 129
files; SURVEY §5). The TPU-native replacement: plain frozen dataclasses as
experiment configs, overridable from the command line with
``--cfg.field=value`` (dotted paths for nesting) plus JSON round-trip for
reproducibility. No global registry, no string-keyed indirection — configs
are just values.
"""
from __future__ import annotations

import dataclasses
import json
import sys
from typing import Any, Optional, Sequence, Type, TypeVar

T = TypeVar("T")


def _convert(value: str, target_type):
  if target_type is bool:
    return value.lower() in ("1", "true", "yes")
  if target_type in (int, float, str):
    return target_type(value)
  # tuples/lists of ints or floats: "64,64"
  try:
    origin = getattr(target_type, "__origin__", None)
    if origin in (tuple, list):
      inner = target_type.__args__[0]
      out = [_convert(v, inner) for v in value.split(",") if v]
      return tuple(out) if origin is tuple else out
  except Exception:
    pass
  return json.loads(value)


def apply_overrides(cfg: T, overrides: Sequence[str], prefix="cfg") -> T:
  """Apply ["--cfg.a.b=3", ...] to a (possibly nested) dataclass."""
  for ov in overrides:
    if not ov.startswith("--"):
      continue
    body = ov[2:]
    if "=" not in body:
      continue
    path, value = body.split("=", 1)
    parts = path.split(".")
    if parts[0] == prefix:
      parts = parts[1:]
    if not parts:
      continue
    cfg = _set_path(cfg, parts, value)
  return cfg


def _set_path(cfg, parts, value):
  field_name = parts[0]
  if not dataclasses.is_dataclass(cfg):
    raise TypeError(f"Cannot override into non-dataclass: {cfg}")
  fields = {f.name: f for f in dataclasses.fields(cfg)}
  if field_name not in fields:
    raise KeyError(
        f"Unknown config field '{field_name}'; valid: {sorted(fields)}")
  current = getattr(cfg, field_name)
  if len(parts) == 1:
    ftype = fields[field_name].type
    if isinstance(ftype, str):
      # from __future__ annotations: resolve basic names
      ftype = {"int": int, "float": float, "str": str, "bool": bool}.get(
          ftype, type(current) if current is not None else str)
    new_value = _convert(value, ftype if not dataclasses.is_dataclass(
        current) else type(current))
  else:
    new_value = _set_path(current, parts[1:], value)
  return dataclasses.replace(cfg, **{field_name: new_value})


def parse_flags(cfg: T, argv: Optional[Sequence[str]] = None,
                prefix="cfg") -> T:
  argv = sys.argv[1:] if argv is None else argv
  return apply_overrides(cfg, argv, prefix)


def to_json(cfg) -> str:
  return json.dumps(dataclasses.asdict(cfg), indent=2, default=str)


def save(cfg, path: str):
  with open(path, "w") as f:
    f.write(to_json(cfg))
