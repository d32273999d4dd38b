"""Checkpointer / PolicySaver / Learner / Actor / triggers tests
(mirrors train/learner_test.py, policies/policy_saver_test.py contracts)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from agents_tpu import metrics, networks, specs
from agents_tpu.agents.dqn import DqnAgent
from agents_tpu.environments.classic.cartpole import CartPole
from agents_tpu.environments.jax_environment import BatchedJaxEnv
from agents_tpu.environments.test_envs import CountingPyEnv
from agents_tpu.policies import policy_saver as ps_lib
from agents_tpu.replay_buffers import UniformReplay
from agents_tpu.train import (Actor, Checkpointer, FusedTrainLoop,
                              IntervalTrigger, Learner, collect_metrics)
from agents_tpu.trajectories import time_step as ts
from agents_tpu.trajectories import trajectory as tj
from agents_tpu.utils import common


def _make_loop(B=4):
  env = BatchedJaxEnv(CartPole(), batch_size=B)
  tss, asp = env.time_step_spec(), env.action_spec()
  qnet = networks.make_q_network(tss.observation, asp,
                                 fc_layer_params=(16,))
  agent = DqnAgent(tss, asp, qnet, optax.adam(1e-3), gamma=0.99,
                   td_errors_loss_fn=common.element_wise_squared_loss)
  replay = UniformReplay(tj.trajectory_spec(tss, asp), batch_size=B,
                         max_length=256)
  return FusedTrainLoop(env, agent, replay, sample_batch_size=16), agent


def test_checkpointer_roundtrip(tmp_path):
  ckpt = Checkpointer(str(tmp_path / "ck"), max_to_keep=2)
  state = {"w": jnp.arange(4.0), "step": jnp.asarray(3)}
  ckpt.save(3, state, force=True)
  ckpt.wait()
  template = {"w": jnp.zeros(4), "step": jnp.asarray(0)}
  restored = ckpt.restore(template)
  np.testing.assert_array_equal(np.asarray(restored["w"]),
                                [0.0, 1.0, 2.0, 3.0])
  assert int(restored["step"]) == 3
  # initialize_or_restore on empty dir returns template
  ckpt2 = Checkpointer(str(tmp_path / "empty"))
  out = ckpt2.initialize_or_restore(template)
  assert int(out["step"]) == 0


def test_policy_saver_roundtrip(tmp_path):
  loop, agent = _make_loop()
  agent_state = agent.init(jax.random.key(0))
  params = agent.policy_params(agent_state)
  saver = ps_lib.PolicySaver(agent.policy, train_step=7,
                             metadata={"env": "CartPole"})
  export = str(tmp_path / "greedy_policy")
  saver.save(export, params)
  loaded = ps_lib.load_policy(export, agent.policy, params)
  assert loaded.get_train_step() == 7
  assert loaded.get_metadata()["env"] == "CartPole"
  step = ts.restart(np.zeros((1, 4), np.float32), batch_size=1)
  astep = loaded.action(step)
  assert int(np.asarray(astep.action)[0]) in (0, 1)
  # actions match the in-memory policy exactly
  direct = agent.policy.action(params, step, (), jax.random.key(0))
  assert int(np.asarray(direct.action)[0]) == int(np.asarray(astep.action)[0])


def test_learner_run_and_restore(tmp_path):
  loop, agent = _make_loop()
  state = loop.init(jax.random.key(0), initial_collect_steps=20)
  learner = Learner(str(tmp_path), loop=loop, initial_state=state,
                    checkpoint_interval=5)
  loss = learner.run(iterations=5)
  assert np.isfinite(loss)
  assert learner.global_step == 5
  learner.checkpoint()
  learner.checkpointer.wait()

  # New learner restores at step 5.
  learner2 = Learner(str(tmp_path), loop=loop, initial_state=loop.init(
      jax.random.key(1), initial_collect_steps=20), checkpoint_interval=5)
  assert learner2.global_step == 5
  np.testing.assert_array_equal(
      np.asarray(jax.tree_util.tree_leaves(
          learner2.state.agent_state.q_params)[0]),
      np.asarray(jax.tree_util.tree_leaves(
          learner.state.agent_state.q_params)[0]))


def test_interval_trigger():
  fired = []
  trig = IntervalTrigger(10, lambda: fired.append(1))
  trig(3)
  assert not fired
  trig(10)
  assert len(fired) == 1
  trig(19)
  assert len(fired) == 1
  trig(20)
  assert len(fired) == 2


def test_actor_with_host_env():
  class GoRight:
    def action(self, time_step, state=()):
      from agents_tpu.trajectories import policy_step
      return policy_step.PolicyStep(action=np.asarray(0, np.int32),
                                    state=state)

    def init_state(self, batch_size=None):
      return ()

  actor = Actor(CountingPyEnv(steps_per_episode=3), GoRight(),
                steps_per_run=9, metrics=collect_metrics(5), name="collect")
  actor.run()
  results = actor.log_metrics()
  assert results["AverageReturn"] == 3.0
  assert results["EnvironmentSteps"] == 9


def test_learner_summary_observability(tmp_path):
  """Learner emits loss, loss extras, collect metrics, and steps/sec under
  the summary gate (reference train/learner.py:285-292)."""
  import json

  from agents_tpu.train import JsonlSummaryWriter

  env = BatchedJaxEnv(CartPole(), batch_size=4)
  tss, asp = env.time_step_spec(), env.action_spec()
  qnet = networks.make_q_network(tss.observation, asp,
                                 fc_layer_params=(16,))
  agent = DqnAgent(tss, asp, qnet, optax.adam(1e-3), gamma=0.99,
                   td_errors_loss_fn=common.element_wise_squared_loss)
  replay = UniformReplay(tj.trajectory_spec(tss, asp), batch_size=4,
                         max_length=256)
  loop = FusedTrainLoop(env, agent, replay, sample_batch_size=16,
                        metrics=metrics.standard_collect_metrics(8))
  state = jax.jit(lambda k: loop.init(k, initial_collect_steps=8))(
      jax.random.key(0))

  path = str(tmp_path / "summaries.jsonl")
  learner = Learner(str(tmp_path), loop=loop, initial_state=state,
                    checkpoint_interval=0,
                    summary_writer=JsonlSummaryWriter(path),
                    summary_interval=2,
                    extra_summary_fn=lambda s: {"staleness": 0.0})
  for _ in range(4):
    learner.run(1)

  keys = set()
  with open(path) as f:
    for line in f:
      rec = json.loads(line)
      keys.update(k for k in rec if k not in ("step", "t"))
  assert "loss" in keys
  assert "loss_extra/td_loss" in keys
  assert "loss_extra/td_error" in keys
  assert "collect/EnvironmentSteps" in keys
  assert "collect/NumberOfEpisodes" in keys
  assert "collect/AverageReturn" in keys
  assert "steps_per_sec" in keys
  assert "staleness" in keys


def test_learner_routes_action_histogram_to_writer(tmp_path):
  """1-D collect metric results (ChosenActionHistogram) flow to the
  writer's histogram surface (reference metrics/tf_metrics.py:369 +
  learner summary gate)."""
  import json

  from agents_tpu.train import JsonlSummaryWriter

  env = BatchedJaxEnv(CartPole(), batch_size=4)
  tss, asp = env.time_step_spec(), env.action_spec()
  qnet = networks.make_q_network(tss.observation, asp,
                                 fc_layer_params=(16,))
  agent = DqnAgent(tss, asp, qnet, optax.adam(1e-3), gamma=0.99,
                   td_errors_loss_fn=common.element_wise_squared_loss)
  replay = UniformReplay(tj.trajectory_spec(tss, asp), batch_size=4,
                         max_length=256)
  loop = FusedTrainLoop(
      env, agent, replay, sample_batch_size=16,
      metrics=metrics.standard_collect_metrics(8)
      + (metrics.ChosenActionHistogram(num_actions=2),))
  state = jax.jit(lambda k: loop.init(k, initial_collect_steps=8))(
      jax.random.key(0))

  path = str(tmp_path / "summaries.jsonl")
  learner = Learner(str(tmp_path), loop=loop, initial_state=state,
                    checkpoint_interval=0,
                    summary_writer=JsonlSummaryWriter(path),
                    summary_interval=1)
  learner.run(2)

  hist = None
  with open(path) as f:
    for line in f:
      rec = json.loads(line)
      if "collect/ChosenActionHistogram" in rec:
        hist = rec["collect/ChosenActionHistogram"]
  assert hist is not None and len(hist) == 2
  assert sum(hist) > 0  # counted some actions
