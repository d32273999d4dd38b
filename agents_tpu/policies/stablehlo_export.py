"""Runtime-independent policy export via jax.export (StableHLO).

The reference's ``PolicySaver`` emits a SavedModel loadable by ANY TF
process or TF-Serving with no tf_agents dependency
(``tf_agents/policies/policy_saver.py:103``,
``py_tf_eager_policy.py:150``). The TPU-native analogue: serialize the
policy's jitted ``action`` function to a StableHLO artifact with
``jax.export`` (multi-platform cpu+tpu, batch-size polymorphic), plus

  - ``params_flat.npz``      — parameter leaves in flattened order
                               (refreshable without re-export)
  - ``exported_manifest.json`` — the calling convention: leaf paths /
                               shapes / dtypes for time_step, state,
                               action, params
  - ``loader.py``            — a self-contained loader written INTO the
                               artifact (numpy + jax only — it never
                               imports agents_tpu), mirroring
                               SavedModel's self-describing property.

Calling convention of the exported function (all pytrees are plain
Python lists, so no custom pytree registrations are needed to call it):

  (flat_params, key_data[2]:uint32, flat_time_step, flat_state)
      -> (flat_action, flat_next_state)

``flat_time_step`` is the flattened (step_type, reward, discount,
*observation-leaves) order of the TimeStep pytree; greedy policies
ignore ``key_data`` (pass zeros).
"""
from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Optional, Sequence

import jax
import numpy as np

from agents_tpu.specs import array_spec
from agents_tpu.trajectories import time_step as ts

ACTION_BLOB = "exported_action.bin"
PARAMS_NPZ = "params_flat.npz"
MANIFEST = "exported_manifest.json"
LOADER = "loader.py"


def _atomic_publish(path: str, write_fn, mode: str = "w"):
  """Write via a UNIQUE tmp file + rename: pollers never read a torn
  file, and two overlapping exporters (e.g. a restarted trainer racing
  a zombie one) cannot truncate each other's half-written tmp — last
  rename wins with a complete file either way."""
  fd, tmp = tempfile.mkstemp(
      dir=os.path.dirname(os.path.abspath(path)),
      prefix=os.path.basename(path) + ".", suffix=".tmp")
  try:
    with os.fdopen(fd, mode) as f:
      write_fn(f)
    os.replace(tmp, path)
  except BaseException:
    if os.path.exists(tmp):
      os.unlink(tmp)
    raise


def atomic_json_dump(obj, path: str):
  """Atomically publish JSON (actors poll policy_manifest.json live)."""
  _atomic_publish(path, lambda f: json.dump(obj, f, indent=2))


def write_params_npz(export_dir: str, params):
  """Atomically write the flat-params npz the exported module consumes.

  Single source of truth for the ``p{i}``/flatten-order contract shared
  by export_action and PolicySaver.save_checkpoint refreshes; a
  concurrent ExportedPolicy.refresh_params() never sees a partial zip."""
  flat = jax.tree_util.tree_leaves(params)
  _atomic_publish(
      os.path.join(export_dir, PARAMS_NPZ),
      lambda f: np.savez(
          f, **{f"p{i}": np.asarray(x) for i, x in enumerate(flat)}),
      mode="wb")


def _leaf_paths(tree, is_leaf=None):
  flat = jax.tree_util.tree_flatten_with_path(tree, is_leaf=is_leaf)[0]
  return ["/".join(
      str(getattr(p, "name", getattr(p, "key", getattr(p, "idx", p))))
      for p in path) for path, _ in flat]


def _spec_leaves(spec_nest):
  return jax.tree_util.tree_leaves(
      spec_nest, is_leaf=lambda x: isinstance(x, array_spec.ArraySpec))


def _full_time_step_spec(policy):
  tss = policy.time_step_spec
  if isinstance(tss, ts.TimeStep):
    return tss
  # policies constructed with observation-spec-only time_step_spec
  return ts.time_step_spec(tss)


def export_action(policy, params, export_dir: str,
                  batch_size: Optional[int] = None,
                  platforms: Sequence[str] = ("cpu", "tpu")) -> dict:
  """Serialize ``policy.action`` to ``export_dir``; returns manifest dict.

  ``batch_size=None`` exports batch-polymorphic (symbolic leading dim);
  a concrete int pins it (fallback for policies whose trace rejects
  symbolic shapes, e.g. iterative CEM refits with shape-dependent
  control flow).
  """
  from jax import export as jax_export

  flat_params, params_td = jax.tree_util.tree_flatten(params)
  tss = _full_time_step_spec(policy)
  ts_leaves_spec, ts_td = jax.tree_util.tree_flatten(
      tss, is_leaf=lambda x: isinstance(x, array_spec.ArraySpec))
  state_leaves_spec = _spec_leaves(policy.state_spec)
  _, state_td = jax.tree_util.tree_flatten(
      policy.state_spec,
      is_leaf=lambda x: isinstance(x, array_spec.ArraySpec))

  def fn(flat_params_in, key_data, flat_ts, flat_state):
    p = jax.tree_util.tree_unflatten(params_td, flat_params_in)
    tstep = jax.tree_util.tree_unflatten(ts_td, flat_ts)
    state = (jax.tree_util.tree_unflatten(state_td, flat_state)
             if state_leaves_spec else ())
    key = jax.random.wrap_key_data(key_data)
    step = policy.action(p, tstep, state, key)
    return (list(jax.tree_util.tree_leaves(step.action)),
            list(jax.tree_util.tree_leaves(step.state)))

  if batch_size is None:
    (b,) = jax_export.symbolic_shape("b")
  else:
    b = int(batch_size)
  param_args = [jax.ShapeDtypeStruct(
      np.shape(x), getattr(x, "dtype", None) or np.asarray(x).dtype)
                for x in flat_params]
  key_arg = jax.ShapeDtypeStruct((2,), np.uint32)
  ts_args = [jax.ShapeDtypeStruct((b,) + tuple(s.shape), np.dtype(s.dtype))
             for s in ts_leaves_spec]
  state_args = [jax.ShapeDtypeStruct((b,) + tuple(s.shape),
                                     np.dtype(s.dtype))
                for s in state_leaves_spec]

  exported = jax_export.export(jax.jit(fn), platforms=list(platforms))(
      param_args, key_arg, ts_args, state_args)
  blob = exported.serialize()

  os.makedirs(export_dir, exist_ok=True)
  _atomic_publish(os.path.join(export_dir, ACTION_BLOB),
                  lambda f: f.write(blob), mode="wb")
  write_params_npz(export_dir, params)

  def describe(specs, batched=True):
    return [{"shape": ([None] if batched else []) + list(s.shape),
             "dtype": np.dtype(s.dtype).name,
             "name": getattr(s, "name", None)} for s in specs]

  manifest = {
      "format": "jax.export StableHLO, calling convention "
                "(flat_params, key_data, flat_time_step, flat_state) -> "
                "(flat_action, flat_next_state)",
      "platforms": list(platforms),
      "batch": "polymorphic" if batch_size is None else int(batch_size),
      "num_params_leaves": len(flat_params),
      "time_step_leaves": describe(ts_leaves_spec),
      "time_step_leaf_paths": _leaf_paths(
          tss, is_leaf=lambda x: isinstance(x, array_spec.ArraySpec)),
      "state_leaves": describe(state_leaves_spec),
      "action_leaves": [
          {"shape": [None] + list(s.shape),
           "dtype": np.dtype(s.dtype).name, "name": s.name}
          for s in _spec_leaves(policy.action_spec)],
  }
  atomic_json_dump(manifest, os.path.join(export_dir, MANIFEST))
  _atomic_publish(os.path.join(export_dir, LOADER),
                  lambda f: f.write(_LOADER_SRC))
  return manifest


# The loader written into every artifact. Deliberately framework-free:
# numpy + jax only, so any process (serving binary, another framework,
# a bare interpreter) can run the policy.
_LOADER_SRC = '''\
"""Self-contained loader for an agents-exported StableHLO policy.

Dependencies: numpy, jax. No framework import. Usage:

    import loader
    policy = loader.ExportedPolicy(os.path.dirname(loader.__file__))
    action_leaves, next_state = policy.action(observation_leaves)
"""
import json
import os

import numpy as np


class ExportedPolicy:

  def __init__(self, artifact_dir):
    from jax import export as jax_export
    self.dir = artifact_dir
    with open(os.path.join(artifact_dir, "exported_manifest.json")) as f:
      self.manifest = json.load(f)
    with open(os.path.join(artifact_dir, "exported_action.bin"), "rb") as f:
      self._exported = jax_export.deserialize(bytearray(f.read()))
    z = np.load(os.path.join(artifact_dir, "params_flat.npz"))
    self.params = [z[f"p{i}"]
                   for i in range(self.manifest["num_params_leaves"])]

  def refresh_params(self):
    z = np.load(os.path.join(self.dir, "params_flat.npz"))
    self.params = [z[f"p{i}"]
                   for i in range(self.manifest["num_params_leaves"])]

  def initial_state(self, batch_size):
    return [np.zeros([batch_size] + d["shape"][1:], d["dtype"])
            for d in self.manifest["state_leaves"]]

  def make_time_step(self, observation_leaves, step_type=None):
    """Build the flat time_step list: (step_type, reward, discount,
    *observation) in manifest order, defaulting to MID steps."""
    descs = self.manifest["time_step_leaves"]
    n_obs = len(observation_leaves)
    batch = np.shape(observation_leaves[0])[0]
    out = []
    for d in descs[:-n_obs] if n_obs < len(descs) else []:
      shape = [batch] + d["shape"][1:]
      if d.get("name") == "step_type":
        arr = np.full(shape, 1 if step_type is None else step_type,
                      d["dtype"])
      elif d.get("name") == "discount":
        arr = np.ones(shape, d["dtype"])
      else:
        arr = np.zeros(shape, d["dtype"])
      out.append(arr)
    return out + [np.asarray(o) for o in observation_leaves]

  def action(self, observation_leaves, state=None, step_type=None,
             key_data=None):
    batch = np.shape(observation_leaves[0])[0]
    flat_ts = self.make_time_step(observation_leaves, step_type)
    if state is None:
      state = self.initial_state(batch)
    if key_data is None:
      key_data = np.zeros((2,), np.uint32)
    acts, next_state = self._exported.call(
        self.params, np.asarray(key_data, np.uint32), flat_ts, state)
    return ([np.asarray(a) for a in acts],
            [np.asarray(s) for s in next_state])
'''
