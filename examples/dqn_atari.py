"""DQN on Atari (Mnih et al. 2015 configuration).

Analogue of ``tf_agents/examples/dqn/mnih15/dqn_train_eval_atari.py``
(hyperparameters :120-180: batch 32, RMSprop-era lr 2.5e-4 via Adam
eps=0.01 as the reference does, polynomial epsilon decay 1.0 -> 0.1 over
250k train steps, target update period 2500, replay 1M frames) on the
DQN-paper preprocessing stack (frame-skip-4 + max-pool + 84x84 grayscale
+ 4-frame stacking, suites.load_atari).

Atari simulation (ALE) runs on host CPUs; the conv Q-network, replay
sampling, and train steps run on the chip through the async
actor-learner loop. Gated: requires `ale-py` (not bundled in every
image) — raises a clear error otherwise.

Usage:
  python examples/dqn_atari.py [--cfg.game=PongNoFrameskip-v4] [--smoke]
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@dataclasses.dataclass(frozen=True)
class Config:
  root_dir: str = "/tmp/agents_tpu/dqn_atari"
  game: str = "PongNoFrameskip-v4"
  env_batch_size: int = 8               # parallel ALE instances
  total_env_steps: int = 12_500_000     # 50M frames / frame-skip 4
  initial_collect_ticks: int = 2500     # x batch ~= 20k random frames
  replay_capacity_frames: int = 1_000_000
  sample_batch_size: int = 32
  train_steps_per_call: int = 8
  utd_ratio: float = 0.25               # 1 train step / 4 collect steps
  conv_layer_params: tuple = ((32, 8, 4), (64, 4, 2), (64, 3, 1))
  fc_layer_params: tuple = (512,)
  learning_rate: float = 2.5e-4
  adam_epsilon: float = 0.01
  epsilon_greedy_final: float = 0.1
  epsilon_decay_steps: int = 250_000
  gamma: float = 0.99
  target_update_period: int = 2500
  progress_every_ticks: int = 2000


def train_eval(cfg: Config):
  import jax
  import jax.numpy as jnp
  import numpy as np
  import optax

  from agents_tpu import networks
  from agents_tpu.agents.dqn import DqnAgent
  from agents_tpu.environments import suites
  from agents_tpu.environments.batched_py_environment import (
      BatchedPyEnvironment,)
  from agents_tpu.metrics import py_metrics
  from agents_tpu.policies.policy_saver import PolicySaver
  from agents_tpu.replay_buffers import UniformReplay
  from agents_tpu.train import AsyncHostDeviceTrainLoop, JsonlSummaryWriter
  from agents_tpu.trajectories import trajectory as tj
  from agents_tpu.utils import common

  if not suites.is_atari_available():
    raise ImportError(
        "dqn_atari requires ale-py (pip install ale-py gymnasium[atari]); "
        "it is not bundled in this image.")

  env = BatchedPyEnvironment(
      [suites.load_atari(cfg.game) for _ in range(cfg.env_batch_size)])
  tss, asp = env.time_step_spec(), env.action_spec()

  # Polynomial epsilon decay 1.0 -> final over decay_steps of train steps
  # (reference :165-171).
  def epsilon_fn(train_step):
    frac = jnp.minimum(
        train_step.astype(jnp.float32) / cfg.epsilon_decay_steps, 1.0)
    return 1.0 + frac * (cfg.epsilon_greedy_final - 1.0)

  qnet = networks.make_q_network(
      tss.observation, asp, conv_layer_params=cfg.conv_layer_params,
      fc_layer_params=cfg.fc_layer_params,
      preprocessing=lambda x: x.astype(jnp.float32) / 255.0)
  agent = DqnAgent(
      tss, asp, qnet,
      optax.adam(cfg.learning_rate, eps=cfg.adam_epsilon),
      epsilon_greedy=epsilon_fn, gamma=cfg.gamma,
      target_update_tau=1.0, target_update_period=cfg.target_update_period,
      td_errors_loss_fn=common.element_wise_huber_loss)
  replay = UniformReplay(
      tj.trajectory_spec(tss, asp), batch_size=cfg.env_batch_size,
      max_length=cfg.replay_capacity_frames // cfg.env_batch_size)
  loop = AsyncHostDeviceTrainLoop(
      env, agent, replay, sample_batch_size=cfg.sample_batch_size,
      train_steps_per_call=cfg.train_steps_per_call,
      utd_ratio=cfg.utd_ratio,
      min_replay_frames=cfg.initial_collect_ticks * cfg.env_batch_size,
      py_metrics=[py_metrics.AverageReturnMetric(20),
                  py_metrics.EnvironmentSteps(),
                  py_metrics.NumberOfEpisodes()])

  writer = JsonlSummaryWriter(os.path.join(cfg.root_dir, "train.jsonl"))
  t0 = time.time()

  def progress(l):
    ret = l.py_metrics[0].result()
    sps = l._env_steps / (time.time() - t0)
    print(f"env_steps={l._env_steps} train_steps={l._train_steps} "
          f"AverageReturn={ret:.1f} ({sps:.0f} env-steps/s)", flush=True)
    writer.scalar("AverageReturn", ret, l._env_steps)

  out = loop.run(
      total_env_batch_steps=cfg.total_env_steps // cfg.env_batch_size,
      initial_random_steps=cfg.initial_collect_ticks,
      progress_fn=progress, progress_every=cfg.progress_every_ticks)

  saver = PolicySaver(agent.policy, train_step=out["train_steps"])
  saver.save(os.path.join(cfg.root_dir, "policies", "greedy"),
             out["agent_state"].q_params
             if hasattr(out["agent_state"], "q_params")
             else out["agent_state"])
  return out


def main(argv):
  cfg = Config()
  overrides = {}
  for arg in argv[1:]:
    if arg == "--smoke":
      overrides.update(total_env_steps=4000, initial_collect_ticks=20,
                       progress_every_ticks=100)
    elif arg.startswith("--cfg."):
      k, v = arg[len("--cfg."):].split("=", 1)
      field = Config.__dataclass_fields__[k]
      overrides[k] = (field.type(v) if callable(field.type)
                      else json.loads(v))
  cfg = dataclasses.replace(cfg, **overrides)
  train_eval(cfg)


if __name__ == "__main__":
  main(sys.argv)
