"""PPO variants, policy utils, train utils, benchmark harness tests."""
import os
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from agents_tpu import networks, specs
from agents_tpu.agents.ppo import PPOClipAgent, PPOKLPenaltyAgent
from agents_tpu.benchmark.return_windows import (ReturnWindow,
                                                 assert_windows,
                                                 check_windows,
                                                 read_jsonl_returns)
from agents_tpu.policies import RandomPolicy
from agents_tpu.policies.policy_utils import (PolicyInfoUpdaterWrapper,
                                              TemporalActionSmoothingPolicy)
from agents_tpu.train.train_utils import (wait_for_file, wait_for_policy,
                                          wait_for_predicate)
from agents_tpu.trajectories import time_step as ts

OBS = specs.ArraySpec((4,), np.float32)
TSS = ts.time_step_spec(OBS)
DACT = specs.BoundedArraySpec((), np.int32, 0, 1)
CACT = specs.BoundedArraySpec((2,), np.float32, -1.0, 1.0)


def test_ppo_variants_construct():
  a = networks.make_actor_distribution_network(OBS, DACT, fc_layer_params=(8,))
  v = networks.make_value_network(OBS, fc_layer_params=(8,))
  clip = PPOClipAgent(TSS, DACT, optax.adam(1e-3), a, v, num_epochs=1)
  assert clip.importance_ratio_clipping == 0.2
  assert clip.initial_adaptive_kl_beta == 0.0
  klp = PPOKLPenaltyAgent(TSS, DACT, optax.adam(1e-3), a, v, num_epochs=1)
  assert klp.importance_ratio_clipping == 0.0
  assert klp.initial_adaptive_kl_beta == 1.0


def test_policy_info_updater():
  pol = PolicyInfoUpdaterWrapper(
      RandomPolicy(TSS, DACT),
      lambda step: {"marker": jnp.ones_like(step.action, jnp.float32)})
  step = ts.restart(jnp.zeros((3, 4)), batch_size=3)
  out = pol.action(None, step, (), jax.random.key(0))
  np.testing.assert_array_equal(np.asarray(out.info["marker"]), 1.0)


def test_temporal_action_smoothing():
  from agents_tpu.policies import FixedPolicy
  inner = FixedPolicy(jnp.ones((2,), jnp.float32), TSS, CACT)
  pol = TemporalActionSmoothingPolicy(inner, smoothing_coefficient=0.5)
  state = pol.init_state(1)
  step = ts.restart(jnp.zeros((1, 4)), batch_size=1)
  s1 = pol.action(None, step, state, jax.random.key(0))
  np.testing.assert_allclose(np.asarray(s1.action), 0.5)  # 0.5*0 + 0.5*1
  # NOTE: pass a MID step so state isn't auto-reset.
  mid = ts.transition(jnp.zeros((1, 4)), jnp.zeros((1,)))
  s2 = pol.action(None, mid, s1.state, jax.random.key(0))
  np.testing.assert_allclose(np.asarray(s2.action), 0.75)


def test_wait_helpers(tmp_path):
  target = tmp_path / "flag.txt"

  def writer():
    time.sleep(0.2)
    target.write_text("ok")

  threading.Thread(target=writer).start()
  found = wait_for_file(str(tmp_path / "*.txt"), 0.05, 5.0)
  assert found and found.endswith("flag.txt")
  assert wait_for_predicate(lambda: True, timeout_secs=1)
  assert not wait_for_predicate(lambda: False, 0.01, 0.05)


def test_return_windows(tmp_path):
  log = tmp_path / "train.jsonl"
  log.write_text("\n".join([
      '{"step": 1000, "AverageReturn": 20.0}',
      '{"step": 64000, "AverageReturn": 198.0}',
  ]))
  pts = read_jsonl_returns(str(log))
  assert pts == [(1000, 20.0), (64000, 198.0)]
  ok = check_windows(pts, (ReturnWindow(64000, 195.0, 200.0),))
  assert ok == {64000: True}
  with pytest.raises(AssertionError):
    assert_windows(pts, (ReturnWindow(1000, 100.0, 200.0),))
