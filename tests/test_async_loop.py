"""AsyncHostDeviceTrainLoop: the single-chip actor-learner
(collector + trainer threads swapping immutable device state — the
reference's distributed SAC shape, SURVEY §3.3, on one process).

Regression focus: run() must be re-entrant. The stop event and the
env/train step counters belong to a run, not the loop object — a second
run() previously inherited a set stop flag (trainer thread exited
instantly) and stale counters (UTD throttle computed against the
previous run's totals)."""
import numpy as np
import optax
import pytest

from agents_tpu import networks
from agents_tpu.agents.sac import SacAgent
from agents_tpu.environments import suite_gym
from agents_tpu.environments.batched_py_environment import (
    BatchedPyEnvironment,)
from agents_tpu.replay_buffers import UniformReplay
from agents_tpu.train import AsyncHostDeviceTrainLoop
from agents_tpu.trajectories import trajectory as tj


def _make_loop(B=2):
  env = BatchedPyEnvironment(
      [suite_gym.load("Pendulum-v1") for _ in range(B)])
  tss, asp = env.time_step_spec(), env.action_spec()
  agent = SacAgent(
      tss, asp,
      critic_network=networks.make_critic_network(
          tss.observation, asp, joint_fc_layer_params=(16,)),
      actor_network=networks.make_sac_actor_network(
          tss.observation, asp, fc_layer_params=(16,)),
      actor_optimizer=optax.adam(3e-4), critic_optimizer=optax.adam(3e-4),
      alpha_optimizer=optax.adam(3e-4))
  replay = UniformReplay(tj.trajectory_spec(tss, asp), batch_size=B,
                         max_length=256)
  return AsyncHostDeviceTrainLoop(
      env, agent, replay, sample_batch_size=16, train_steps_per_call=4,
      utd_ratio=1.0, min_replay_frames=4 * B)


def test_async_loop_trains_and_is_reentrant():
  loop = _make_loop()
  out1 = loop.run(total_env_batch_steps=120, seed=0,
                  initial_random_steps=4)
  assert out1["env_steps"] == 240
  assert out1["train_steps"] > 0, "trainer thread never trained (run 1)"
  # Second run on the SAME loop object: fresh counters, live trainer.
  out2 = loop.run(total_env_batch_steps=120, seed=1,
                  initial_random_steps=4)
  assert out2["env_steps"] == 240
  assert out2["train_steps"] > 0, (
      "trainer thread dead on re-run (stop flag not cleared)")
  # Counters are per-run, not cumulative across runs.
  assert out2["train_steps"] <= 240, out2["train_steps"]
  # UTD throttle: never exceeds the 1.0 budget by more than one chunk.
  assert out2["train_steps"] <= out2["env_steps"] + 4
