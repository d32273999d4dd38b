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


# -- round-4 policy/network/distribution review regressions -----------------

def test_normal_sample_broadcasts_scale_batch():
  """Normal(loc=scalar, scale=[B]) must draw B INDEPENDENT samples (the
  review found eps was shaped from loc only, perfectly correlating the
  batch)."""
  from agents_tpu import distributions as dist_lib
  d = dist_lib.Normal(loc=0.0, scale=jnp.ones(64))
  x = np.asarray(d.sample(jax.random.key(0)))
  assert x.shape == (64,) and np.std(x) > 0.3
  sq = dist_lib.SquashedNormal(loc=0.0, scale=jnp.ones(64), low=-1.0,
                               high=1.0, event_ndims=0)
  y, lp = sq.sample_and_log_prob(jax.random.key(1))
  assert np.asarray(y).shape == (64,) and np.std(np.asarray(y)) > 0.1


def test_q_policy_respects_nonzero_action_minimum():
  """BoundedArraySpec minimum=1: greedy actions must live in [1, 4] via
  ShiftedCategorical (reference q_policy.py:182-189); DqnAgent itself
  rejects such specs loudly like the reference."""
  from agents_tpu.policies.q_policy import QPolicy
  from agents_tpu.policies.wrappers import GreedyPolicy
  from agents_tpu.trajectories import time_step as ts_mod
  from agents_tpu.agents.dqn import DqnAgent

  obs = specs.ArraySpec((3,), np.float32)
  tss = ts_mod.time_step_spec(obs)
  act = specs.BoundedArraySpec((), np.int32, 1, 4)
  net = networks.make_q_network(obs, act, fc_layer_params=(8,))
  pol = GreedyPolicy(QPolicy(tss, act, net))
  params = net.init_params(jax.random.key(0))
  tstep = ts_mod.TimeStep(step_type=jnp.zeros((16,), jnp.int32),
                          reward=jnp.zeros((16,)),
                          discount=jnp.ones((16,)),
                          observation=jnp.linspace(
                              -1, 1, 48).reshape(16, 3))
  a = np.asarray(pol.action(params, tstep, (), jax.random.key(1)).action)
  assert a.min() >= 1 and a.max() <= 4
  with pytest.raises(ValueError):
    DqnAgent(tss, act, net, optax.adam(1e-3))


def test_categorical_projection_keeps_event_dim():
  """(1,)-shaped discrete spec: sampled actions are [B, 1], matching the
  spec (the review found the event dim was dropped)."""
  obs = specs.ArraySpec((3,), np.float32)
  act = specs.BoundedArraySpec((1,), np.int32, 0, 3)
  net = networks.make_actor_distribution_network(obs, act,
                                                 fc_layer_params=(8,))
  params = net.init_params(jax.random.key(0))
  dist, _ = net.apply(params, jnp.zeros((5, 3)), jnp.zeros((5,), jnp.int32),
                      ())
  leaf = jax.tree_util.tree_leaves(
      dist, is_leaf=lambda d: hasattr(d, "sample"))[0]
  assert np.asarray(leaf.sample(jax.random.key(1))).shape == (5, 1)


def test_random_policy_log_prob_counts_elements():
  """Uniform log-prob must be JOINT over all spec elements: (3,)-shaped
  continuous in [-1, 1] -> -3*log(2); (2,)-shaped K-valued discrete ->
  -2*log(K)."""
  from agents_tpu.policies.random_policy import RandomPolicy
  from agents_tpu.trajectories import policy_step as ps_mod
  from agents_tpu.trajectories import time_step as ts_mod

  obs = specs.ArraySpec((2,), np.float32)
  tss = ts_mod.time_step_spec(obs)
  tstep = ts_mod.TimeStep(step_type=jnp.zeros((4,), jnp.int32),
                          reward=jnp.zeros((4,)), discount=jnp.ones((4,)),
                          observation=jnp.zeros((4, 2)))
  cont = specs.BoundedArraySpec((3,), np.float32, -1.0, 1.0)
  pol = RandomPolicy(tss, cont, emit_log_probability=True)
  step = pol.action((), tstep, (), jax.random.key(0))
  np.testing.assert_allclose(
      np.asarray(ps_mod.get_log_probability(step.info)),
      -3 * np.log(2.0), rtol=1e-6)
  disc = specs.BoundedArraySpec((2,), np.int32, 0, 4)
  pol2 = RandomPolicy(tss, disc, emit_log_probability=True)
  step2 = pol2.action((), tstep, (), jax.random.key(0))
  np.testing.assert_allclose(
      np.asarray(ps_mod.get_log_probability(step2.info)),
      -2 * np.log(5.0), rtol=1e-6)


def test_greedy_policy_emits_log_prob_and_event_dims():
  """GreedyPolicy over an emit_log_probability actor: info carries
  log-prob 0 (deterministic mode); GreedyPolicy.distribution log_prob
  reduces the wrapped event dims to [B]."""
  from agents_tpu.policies.actor_policy import ActorPolicy
  from agents_tpu.policies.wrappers import GreedyPolicy
  from agents_tpu.trajectories import policy_step as ps_mod
  from agents_tpu.trajectories import time_step as ts_mod

  obs = specs.ArraySpec((3,), np.float32)
  tss = ts_mod.time_step_spec(obs)
  act = specs.BoundedArraySpec((2,), np.float32, -1.0, 1.0)
  net = networks.make_sac_actor_network(obs, act, fc_layer_params=(8,))
  pol = GreedyPolicy(ActorPolicy(tss, act, net,
                                 emit_log_probability=True))
  assert pol.emit_log_probability
  params = net.init_params(jax.random.key(0))
  tstep = ts_mod.TimeStep(step_type=jnp.zeros((4,), jnp.int32),
                          reward=jnp.zeros((4,)), discount=jnp.ones((4,)),
                          observation=jnp.zeros((4, 3)))
  step = pol.action(params, tstep, (), jax.random.key(1))
  np.testing.assert_allclose(
      np.asarray(ps_mod.get_log_probability(step.info)), 0.0)
  dstep = pol.distribution(params, tstep, ())
  d = jax.tree_util.tree_leaves(
      dstep.action, is_leaf=lambda x: hasattr(x, "log_prob"))[0]
  assert np.asarray(d.log_prob(d.mode())).shape == (4,)


def test_inner_reshape_preserves_outer_dims():
  from agents_tpu.networks.sequential import inner_reshape
  x = jnp.zeros((2, 5, 16))
  assert inner_reshape((4, 4)).__call__(x).shape == (2, 5, 4, 4)
  assert inner_reshape((16,))(jnp.zeros((3, 16))).shape == (3, 16)
