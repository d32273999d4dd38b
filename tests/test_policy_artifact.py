"""Self-contained policy artifact tests (reference SavedModel parity:
policy_saver.py:103 restores with zero user code; triggers.py:40 exports
the greedy/collect/raw trio)."""
import json
import os
import subprocess
import sys
import textwrap

import jax
import numpy as np
import optax
import pytest

from agents_tpu import networks, specs
from agents_tpu.policies import registry as pol_registry
from agents_tpu.policies.actor_policy import ActorPolicy
from agents_tpu.policies.policy_saver import (PolicySaver, load_manifest,
                                              load_policy)
from agents_tpu.policies.q_policy import QPolicy
from agents_tpu.policies.wrappers import (EpsilonGreedyPolicy, GaussianPolicy,
                                          GreedyPolicy)
from agents_tpu.trajectories import time_step as ts

OBS = specs.ArraySpec((4,), np.float32)
TSS = ts.time_step_spec(OBS)
DISC_ACT = specs.BoundedArraySpec((), np.int32, 0, 2)
CONT_ACT = specs.BoundedArraySpec((2,), np.float32, -1.0, 1.0)


def _batch_ts(B=3):
  return ts.TimeStep(step_type=np.zeros((B,), np.int32),
                     reward=np.zeros((B,), np.float32),
                     discount=np.ones((B,), np.float32),
                     observation=np.ones((B, 4), np.float32))


def test_policy_config_roundtrip_q_and_wrappers():
  net = networks.make_q_network(OBS, DISC_ACT, fc_layer_params=(16,))
  pol = EpsilonGreedyPolicy(QPolicy(TSS, DISC_ACT, net), epsilon=0.25)
  cfg = pol_registry.policy_config(pol)
  assert cfg["type"] == "EpsilonGreedyPolicy"
  assert cfg["kwargs"]["epsilon"] == 0.25
  # JSON round-trip (what the manifest does).
  cfg = json.loads(json.dumps(cfg))
  rebuilt = pol_registry.build_policy(cfg, TSS, DISC_ACT)
  assert isinstance(rebuilt, EpsilonGreedyPolicy)
  assert isinstance(rebuilt.wrapped, QPolicy)


def test_policy_config_opaque_cases():
  net = networks.make_q_network(OBS, DISC_ACT)
  # Callable epsilon schedule is unrepresentable.
  pol = EpsilonGreedyPolicy(QPolicy(TSS, DISC_ACT, net),
                            epsilon=lambda step: 0.1)
  assert pol_registry.policy_config(pol) is None
  # Hand-assembled network (no build_config).
  from agents_tpu.networks.network import Network
  raw_net = Network(net.module, OBS)
  assert pol_registry.policy_config(QPolicy(TSS, DISC_ACT, raw_net)) is None


def test_self_contained_save_load_same_process(tmp_path):
  net = networks.make_sac_actor_network(OBS, CONT_ACT, fc_layer_params=(16,))
  policy = GreedyPolicy(ActorPolicy(TSS, CONT_ACT, net))
  params = net.init_params(jax.random.key(0))
  PolicySaver(policy, train_step=7, metadata={"env": "test"}).save(
      str(tmp_path / "export"), params)

  loaded = load_policy(str(tmp_path / "export"))   # no policy, no template
  assert loaded.get_train_step() == 7
  assert loaded.get_metadata() == {"env": "test"}
  step = loaded.action(_batch_ts())
  a = np.asarray(step.action)
  assert a.shape == (3, 2) and np.all(np.abs(a) <= 1.0)

  # Same params -> same greedy action as the original policy.
  from agents_tpu.policies.jitted_py_policy import JittedPyPolicy
  ref = JittedPyPolicy(policy, params).action(_batch_ts())
  np.testing.assert_allclose(np.asarray(ref.action), a, rtol=1e-5)


def test_opaque_artifact_requires_explicit_policy(tmp_path):
  from agents_tpu.networks.network import Network
  net0 = networks.make_q_network(OBS, DISC_ACT, fc_layer_params=(8,))
  net = Network(net0.module, OBS)  # strip build_config
  policy = QPolicy(TSS, DISC_ACT, net)
  params = net.init_params(jax.random.key(0))
  PolicySaver(policy).save(str(tmp_path / "export"), params)
  assert load_manifest(str(tmp_path / "export"))["policy_config"] is None
  with pytest.raises(ValueError, match="policy_config"):
    load_policy(str(tmp_path / "export"))
  # Explicit path still works.
  loaded = load_policy(str(tmp_path / "export"), policy=policy,
                       params_template=params)
  loaded.action(_batch_ts())


def test_cross_process_restore(tmp_path):
  """Save here; restore and act in a FRESH python process given only the
  export dir (the zero-user-code SavedModel property)."""
  net = networks.make_q_network(OBS, DISC_ACT, fc_layer_params=(16,))
  policy = GreedyPolicy(QPolicy(TSS, DISC_ACT, net))
  params = net.init_params(jax.random.key(1))
  export = str(tmp_path / "export")
  PolicySaver(policy, train_step=3).save(export, params)

  child = textwrap.dedent(f"""
      import sys; sys.path.insert(0, {repr(os.getcwd())})
      import numpy as np
      from agents_tpu.policies.policy_saver import load_policy
      from agents_tpu.trajectories import time_step as ts
      loaded = load_policy({repr(export)})
      step = loaded.action(ts.TimeStep(
          step_type=np.zeros((2,), np.int32),
          reward=np.zeros((2,), np.float32),
          discount=np.ones((2,), np.float32),
          observation=np.ones((2, 4), np.float32)))
      a = np.asarray(step.action)
      assert a.shape == (2,) and loaded.get_train_step() == 3
      print("CHILD_OK", a.tolist())
  """)
  env = dict(os.environ)
  env.pop("PALLAS_AXON_POOL_IPS", None)
  env["JAX_PLATFORMS"] = "cpu"
  out = subprocess.run([sys.executable, "-c", child], capture_output=True,
                       text=True, timeout=300, env=env,
                       cwd=os.path.dirname(os.path.dirname(__file__)))
  assert "CHILD_OK" in out.stdout, out.stderr[-2000:]


def test_trigger_exports_policy_trio(tmp_path):
  from agents_tpu.agents.dqn import DqnAgent
  from agents_tpu.train.triggers import PolicyCheckpointTrigger

  net = networks.make_q_network(OBS, DISC_ACT, fc_layer_params=(8,))
  agent = DqnAgent(TSS, DISC_ACT, net, optax.adam(1e-3))
  state = agent.init(jax.random.key(0))
  trig = PolicyCheckpointTrigger(str(tmp_path), agent, lambda: state,
                                 interval=1)
  trig(1)
  for name in ("greedy_policy", "collect_policy", "policy"):
    d = tmp_path / "policies" / name
    assert (d / "policy_manifest.json").exists(), name
