"""Runtime-independent policy export (jax.export / StableHLO).

Reference parity target: a SavedModel from ``PolicySaver`` runs in any
TF process with NO tf_agents dependency
(tf_agents/policies/policy_saver.py:103, py_tf_eager_policy.py:150).
Here: the exported artifact must act correctly in a fresh interpreter
that never imports agents_tpu — only numpy + jax + the loader.py the
artifact itself carries.
"""
import json
import os
import subprocess
import sys
import textwrap

import jax
import numpy as np
import pytest

from agents_tpu import networks, specs
from agents_tpu.policies.policy_saver import PolicySaver
from agents_tpu.policies.q_policy import QPolicy
from agents_tpu.policies.wrappers import GreedyPolicy
from agents_tpu.trajectories import time_step as ts

OBS = specs.ArraySpec((4,), np.float32)
TSS = ts.time_step_spec(OBS)
DISC_ACT = specs.BoundedArraySpec((), np.int32, 0, 2)
CONT_ACT = specs.BoundedArraySpec((2,), np.float32, -1.0, 1.0)


def _run_bare_child(artifact_dir, obs, tmp_path, extra=""):
  """Run the artifact's own loader.py in a fresh interpreter from a
  neutral cwd; assert agents_tpu was NEVER imported; return actions."""
  obs_path = os.path.join(str(tmp_path), "obs.npy")
  np.save(obs_path, obs)
  child = textwrap.dedent(f"""
      import importlib.util, json, sys
      import numpy as np
      spec = importlib.util.spec_from_file_location(
          "artifact_loader", {repr(os.path.join(artifact_dir, "loader.py"))})
      loader = importlib.util.module_from_spec(spec)
      spec.loader.exec_module(loader)
      policy = loader.ExportedPolicy({repr(artifact_dir)})
      obs = np.load({repr(obs_path)})
      acts, state = policy.action([obs])
      {extra}
      assert not any(m.startswith("agents_tpu") for m in sys.modules), (
          "framework leaked into the bare process")
      print("CHILD_OK", json.dumps([a.tolist() for a in acts]))
  """)
  env = dict(os.environ)
  env.pop("PALLAS_AXON_POOL_IPS", None)
  env["JAX_PLATFORMS"] = "cpu"
  env.pop("PYTHONPATH", None)
  out = subprocess.run([sys.executable, "-c", child], capture_output=True,
                       text=True, timeout=300, env=env, cwd=str(tmp_path))
  assert "CHILD_OK" in out.stdout, (out.stdout[-1000:], out.stderr[-2000:])
  payload = out.stdout.split("CHILD_OK", 1)[1].strip()
  return [np.asarray(a) for a in json.loads(payload)]


def test_greedy_q_policy_acts_without_framework(tmp_path):
  net = networks.make_q_network(OBS, DISC_ACT, fc_layer_params=(16,))
  policy = GreedyPolicy(QPolicy(TSS, DISC_ACT, net))
  params = net.init_params(jax.random.key(1))
  export = str(tmp_path / "export")
  PolicySaver(policy, train_step=3).save(export, params)
  assert os.path.exists(os.path.join(export, "exported_action.bin"))
  manifest = json.load(open(os.path.join(export, "exported_manifest.json")))
  assert manifest["batch"] == "polymorphic"

  rng = np.random.RandomState(0)
  obs = rng.randn(5, 4).astype(np.float32)
  tstep = ts.TimeStep(step_type=np.ones((5,), np.int32),
                      reward=np.zeros((5,), np.float32),
                      discount=np.ones((5,), np.float32),
                      observation=obs)
  expected = np.asarray(
      policy.action(params, tstep, (), jax.random.key(0)).action)

  (got,) = _run_bare_child(export, obs, tmp_path)
  np.testing.assert_array_equal(got, expected)


def test_sac_actor_greedy_continuous(tmp_path):
  net = networks.make_sac_actor_network(OBS, CONT_ACT,
                                        fc_layer_params=(16, 16))
  from agents_tpu.policies.actor_policy import ActorPolicy
  policy = GreedyPolicy(ActorPolicy(TSS, CONT_ACT, net))
  params = net.init_params(jax.random.key(2))
  export = str(tmp_path / "export_sac")
  PolicySaver(policy).save(export, params)

  rng = np.random.RandomState(1)
  # two different batch sizes — the export is batch-polymorphic
  for B in (2, 7):
    obs = rng.randn(B, 4).astype(np.float32)
    tstep = ts.TimeStep(step_type=np.ones((B,), np.int32),
                        reward=np.zeros((B,), np.float32),
                        discount=np.ones((B,), np.float32),
                        observation=obs)
    expected = np.asarray(
        policy.action(params, tstep, (), jax.random.key(0)).action)
    (got,) = _run_bare_child(export, obs, tmp_path)
    assert got.shape == (B, 2)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_params_refresh_without_reexport(tmp_path):
  """save_checkpoint rewrites only params_flat.npz; the bare loader picks
  up the new weights (the SavedModel update_from_checkpoint analogue)."""
  net = networks.make_q_network(OBS, DISC_ACT, fc_layer_params=(8,))
  policy = GreedyPolicy(QPolicy(TSS, DISC_ACT, net))
  saver = PolicySaver(policy)
  p1 = net.init_params(jax.random.key(1))
  p2 = net.init_params(jax.random.key(9))
  export = str(tmp_path / "export_refresh")
  saver.save(export, p1)
  saver.save_checkpoint(export, p2)

  rng = np.random.RandomState(2)
  obs = rng.randn(6, 4).astype(np.float32)
  tstep = ts.TimeStep(step_type=np.ones((6,), np.int32),
                      reward=np.zeros((6,), np.float32),
                      discount=np.ones((6,), np.float32),
                      observation=obs)
  expected_p2 = np.asarray(
      policy.action(p2, tstep, (), jax.random.key(0)).action)
  (got,) = _run_bare_child(export, obs, tmp_path)
  np.testing.assert_array_equal(got, expected_p2)


def test_recurrent_q_policy_state_threading(tmp_path):
  """LSTM policy export: the flat_state group carries the recurrent
  carry through the exported module; state must change across steps and
  the two-step action sequence must match the in-framework policy."""
  qrnn = networks.make_q_rnn_network(OBS, DISC_ACT,
                                     input_fc_layer_params=(8,),
                                     lstm_size=8)
  policy = GreedyPolicy(QPolicy(TSS, DISC_ACT, qrnn))
  params = qrnn.init_params(jax.random.key(4))
  export = str(tmp_path / "export_rnn")
  PolicySaver(policy).save(export, params)
  manifest = json.load(open(os.path.join(export, "exported_manifest.json")))
  assert manifest["state_leaves"], "LSTM state missing from manifest"

  rng = np.random.RandomState(4)
  obs1 = rng.randn(3, 4).astype(np.float32)
  obs2 = rng.randn(3, 4).astype(np.float32)
  obs2_path = os.path.join(str(tmp_path), "obs2.npy")
  np.save(obs2_path, obs2)
  # in-framework two-step rollout (MID steps so state is carried)
  def mk(o):
    return ts.TimeStep(step_type=np.ones((3,), np.int32),
                       reward=np.zeros((3,), np.float32),
                       discount=np.ones((3,), np.float32), observation=o)
  st = policy.init_state(3)
  s1 = policy.action(params, mk(obs1), st, jax.random.key(0))
  s2 = policy.action(params, mk(obs2), s1.state, jax.random.key(0))
  exp_actions = np.stack([np.asarray(s1.action), np.asarray(s2.action)])

  extra = (f"obs2 = np.load({obs2_path!r})\n"
           "      acts2, state2 = policy.action([obs2], state=state)\n"
           "      assert any(np.abs(a).sum() > 0 for a in state)\n"
           "      acts = [np.stack([acts[0], acts2[0]])]")
  (got,) = _run_bare_child(export, obs1, tmp_path, extra=extra)
  np.testing.assert_array_equal(got, exp_actions)


def test_stochastic_policy_exports_and_samples(tmp_path):
  """A stochastic (collect) policy exports too; the key is an explicit
  uint32[2] argument; sampled actions respect the bounded spec."""
  net = networks.make_sac_actor_network(OBS, CONT_ACT,
                                        fc_layer_params=(8,))
  from agents_tpu.policies.actor_policy import ActorPolicy
  policy = ActorPolicy(TSS, CONT_ACT, net)
  params = net.init_params(jax.random.key(3))
  export = str(tmp_path / "export_stoch")
  PolicySaver(policy).save(export, params)

  obs = np.random.RandomState(3).randn(4, 4).astype(np.float32)
  extra = ("acts2, _ = policy.action([obs], key_data=np.asarray("
           "[7, 9], np.uint32))\n"
           "      assert not np.allclose(acts[0], acts2[0])\n"
           "      assert np.all(np.abs(acts2[0]) <= 1.0 + 1e-6)")
  (got,) = _run_bare_child(export, obs, tmp_path, extra=extra)
  assert got.shape == (4, 2)
  assert np.all(np.abs(got) <= 1.0 + 1e-6)
