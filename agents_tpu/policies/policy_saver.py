"""Policy export/import.

Analogue of ``tf_agents/policies/policy_saver.py:103`` (SavedModel export
with action/get_initial_state/get_train_step/get_metadata signatures) and
``policy_loader.py``. The TPU-native artifact is orbax-checkpointed params
plus a JSON spec manifest; `load_policy` returns a `JittedPyPolicy`-style
callable. Being pure pytrees, saved policies restore into ANY process
(the SavedModelPyTFEagerPolicy analogue, py_tf_eager_policy.py:150) —
`update_from_checkpoint` is just re-reading params (:253).
"""
from __future__ import annotations

import json
import os
from typing import Any, Callable, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from agents_tpu.specs import array_spec


def _spec_to_json(spec):
  def leaf(s):
    d = {"shape": list(s.shape), "dtype": np.dtype(s.dtype).name,
         "name": s.name}
    if isinstance(s, array_spec.BoundedArraySpec):
      d["minimum"] = np.asarray(s.minimum).tolist()
      d["maximum"] = np.asarray(s.maximum).tolist()
    return d

  return jax.tree_util.tree_map(
      leaf, spec, is_leaf=lambda x: isinstance(x, array_spec.ArraySpec))


def _spec_from_json(d):
  if isinstance(d, dict) and "dtype" in d and "shape" in d:
    if "minimum" in d:
      return array_spec.BoundedArraySpec(
          tuple(d["shape"]), d["dtype"], np.asarray(d["minimum"]),
          np.asarray(d["maximum"]), d.get("name"))
    return array_spec.ArraySpec(tuple(d["shape"]), d["dtype"], d.get("name"))
  if isinstance(d, dict):
    return {k: _spec_from_json(v) for k, v in d.items()}
  if isinstance(d, list):
    return [_spec_from_json(v) for v in d]
  return d


class PolicySaver:
  """Saves (params, specs, train_step, metadata) for a policy."""

  def __init__(self, policy, train_step: int = 0, metadata: Optional[dict] = None):
    self.policy = policy
    self.train_step = train_step
    self.metadata = metadata or {}

  def save(self, export_dir: str, params, stablehlo: bool = True):
    """Write the full artifact: orbax params + manifest (+ by default a
    runtime-independent StableHLO export of `action`, the SavedModel
    analogue — see stablehlo_export.py; set stablehlo=False to skip,
    e.g. for frequent mid-training exports where only params change)."""
    from agents_tpu.policies.registry import policy_config
    export_dir = os.path.abspath(export_dir)
    os.makedirs(export_dir, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
      ckptr.save(os.path.join(export_dir, "params"), params, force=True)
    stablehlo_info = None
    if stablehlo:
      from agents_tpu.policies import stablehlo_export
      try:
        stablehlo_export.export_action(self.policy, params, export_dir)
        stablehlo_info = "batch-polymorphic"
      except Exception:  # symbolic-shape-hostile trace: pin batch 1
        try:
          stablehlo_export.export_action(self.policy, params, export_dir,
                                         batch_size=1)
          stablehlo_info = "batch=1"
        except Exception as e:  # policy not exportable (host callbacks...)
          stablehlo_info = f"unavailable: {type(e).__name__}"
    # Policies may be built with an observation-only time_step_spec —
    # normalize to a full TimeStep like stablehlo_export does.
    from agents_tpu.policies.stablehlo_export import _full_time_step_spec
    tss = _full_time_step_spec(self.policy)
    manifest = {
        "time_step_spec": {
            "observation": _spec_to_json(tss.observation),
            "reward": _spec_to_json(tss.reward),
        },
        "action_spec": _spec_to_json(self.policy.action_spec),
        "train_step": int(self.train_step),
        "metadata": self.metadata,
        "stablehlo": stablehlo_info,
        # Self-contained restore (reference SavedModel parity,
        # policy_saver.py:103): the full policy/network architecture as a
        # config, or null when the policy holds unserializable pieces —
        # then load_policy needs the explicit policy object.
        "policy_config": policy_config(self.policy),
    }
    from agents_tpu.policies import stablehlo_export
    stablehlo_export.atomic_json_dump(
        manifest, os.path.join(export_dir, "policy_manifest.json"))

  def save_checkpoint(self, export_dir: str, params):
    """Params-only refresh (reference save_checkpoint :676). Also
    refreshes the StableHLO artifact's flat-params npz (no re-export
    needed — the exported module takes params as arguments). All writes
    are atomic (tmp+rename) because actors poll these files live."""
    export_dir = os.path.abspath(export_dir)
    with ocp.StandardCheckpointer() as ckptr:
      ckptr.save(os.path.join(export_dir, "params"), params, force=True)
    from agents_tpu.policies import stablehlo_export
    if os.path.exists(os.path.join(export_dir,
                                   stablehlo_export.ACTION_BLOB)):
      stablehlo_export.write_params_npz(export_dir, params)
    manifest_path = os.path.join(export_dir, "policy_manifest.json")
    if os.path.exists(manifest_path):
      with open(manifest_path) as f:
        manifest = json.load(f)
      manifest["train_step"] = int(self.train_step)
      stablehlo_export.atomic_json_dump(manifest, manifest_path)


class SavedPolicy:
  """A loaded policy: numpy in, numpy out (SavedModelPyTFEagerPolicy
  analogue)."""

  def __init__(self, policy, params, train_step: int, metadata: dict,
               export_dir: str):
    from agents_tpu.policies.jitted_py_policy import JittedPyPolicy
    self.policy = policy
    self.params = params
    self.train_step = train_step
    self.metadata = metadata
    self._export_dir = export_dir
    self._py = JittedPyPolicy(policy, params)

  def action(self, time_step, state=()):
    return self._py.action(time_step, state)

  def init_state(self, batch_size=None):
    return self.policy.init_state(batch_size)

  def get_train_step(self):
    return self.train_step

  def get_metadata(self):
    return self.metadata

  def update_from_checkpoint(self, export_dir: Optional[str] = None):
    """Re-read params (reference :253)."""
    export_dir = export_dir or self._export_dir
    with ocp.StandardCheckpointer() as ckptr:
      params = ckptr.restore(
          os.path.join(os.path.abspath(export_dir), "params"), self.params)
    self.params = params
    self._py.update_params(params)


def load_manifest(export_dir: str) -> dict:
  with open(os.path.join(export_dir, "policy_manifest.json")) as f:
    return json.load(f)


def load_policy(export_dir: str, policy=None,
                params_template=None) -> SavedPolicy:
  """Load an exported policy.

  Self-contained path (reference SavedModel parity): with no `policy`
  argument the policy object is rebuilt from the manifest's
  ``policy_config`` (network architecture + wrapper stack + specs) and
  params restore without a caller template — a fresh process needs only
  the export directory.

  Explicit path: pass `policy` (and optionally `params_template`) for
  artifacts whose manifest has no ``policy_config`` (custom policy
  classes, callables the config can't represent).
  """
  export_dir = os.path.abspath(export_dir)
  manifest = load_manifest(export_dir)
  if policy is None:
    from agents_tpu.policies.registry import build_policy
    from agents_tpu.trajectories import time_step as ts
    cfg = manifest.get("policy_config")
    if cfg is None:
      raise ValueError(
          f"{export_dir} was saved without a policy_config (the policy "
          "held unserializable pieces); pass the policy object to "
          "load_policy explicitly.")
    tss = ts.time_step_spec(
        _spec_from_json(manifest["time_step_spec"]["observation"]),
        _spec_from_json(manifest["time_step_spec"]["reward"]))
    policy = build_policy(cfg, tss, _spec_from_json(manifest["action_spec"]))
  with ocp.StandardCheckpointer() as ckptr:
    if params_template is None:
      params = ckptr.restore(os.path.join(export_dir, "params"))
    else:
      params = ckptr.restore(os.path.join(export_dir, "params"),
                             params_template)
  return SavedPolicy(policy, params, manifest["train_step"],
                     manifest.get("metadata", {}), export_dir)
