"""SAC on MuJoCo HalfCheetah (haarnoja18 config).

Analogue of ``tf_agents/examples/sac/haarnoja18/sac_train_eval.py``: host
MuJoCo simulation feeding the on-device replay + learner through the
async actor-learner loop (single chip playing both roles).

Usage:
  python examples/sac_halfcheetah.py [--cfg.total_env_steps=1000000]
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@dataclasses.dataclass(frozen=True)
class Config:
  root_dir: str = "/tmp/agents_tpu/sac_halfcheetah"
  env_name: str = "HalfCheetah-v5"
  env_batch_size: int = 32
  total_env_steps: int = 1_000_000
  initial_collect_ticks: int = 300      # x batch = random frames
  replay_capacity: int = 32768          # per row (~1M frames total)
  sample_batch_size: int = 256
  train_steps_per_call: int = 16
  utd_ratio: float = 0.5
  actor_fc_layers: tuple = (256, 256)
  critic_joint_fc_layers: tuple = (256, 256)
  actor_lr: float = 3e-4
  critic_lr: float = 3e-4
  alpha_lr: float = 3e-4
  gamma: float = 0.99
  target_update_tau: float = 0.005
  reward_scale_factor: float = 0.1
  progress_every_ticks: int = 1000
  # Greedy-policy eval, the reference protocol (sac_train_eval.py:204,344:
  # 30 episodes, eval_interval 10000; we eval every `eval_every_ticks`
  # env-batch ticks = 256k env steps, plus once at the end).
  num_eval_episodes: int = 30
  num_eval_envs: int = 10
  eval_every_ticks: int = 8000
  # Periodic full-state checkpoint (agent + optimizer + replay + RNG +
  # counters + metric buffers) via orbax, the analogue of the reference
  # Learner's checkpoint trigger (tf_agents/train/learner.py:256-263) —
  # without it any multi-hour run is all-or-nothing (learner.py:146-152).
  # `resume=True` restores the latest checkpoint under root_dir if one
  # exists; host envs restart from reset (reference actor semantics).
  checkpoint_interval_ticks: int = 8000
  checkpoint_max_to_keep: int = 2
  resume: bool = True
  seed: int = 0


def train_eval(cfg: Config):
  import jax
  import numpy as np
  import optax

  from agents_tpu import networks
  from agents_tpu.environments import suite_gym
  from agents_tpu.environments.batched_py_environment import (
      BatchedPyEnvironment,)
  from agents_tpu.agents.sac import SacAgent
  from agents_tpu.metrics import py_metrics
  from agents_tpu.policies.policy_saver import PolicySaver
  from agents_tpu.replay_buffers import UniformReplay
  from agents_tpu.train import AsyncHostDeviceTrainLoop, JsonlSummaryWriter
  from agents_tpu.trajectories import trajectory as tj

  env = BatchedPyEnvironment(
      [suite_gym.load(cfg.env_name) for _ in range(cfg.env_batch_size)])
  tss, asp = env.time_step_spec(), env.action_spec()
  agent = SacAgent(
      tss, asp,
      critic_network=networks.make_critic_network(
          tss.observation, asp,
          joint_fc_layer_params=cfg.critic_joint_fc_layers),
      actor_network=networks.make_sac_actor_network(
          tss.observation, asp, fc_layer_params=cfg.actor_fc_layers),
      actor_optimizer=optax.adam(cfg.actor_lr),
      critic_optimizer=optax.adam(cfg.critic_lr),
      alpha_optimizer=optax.adam(cfg.alpha_lr),
      gamma=cfg.gamma, target_update_tau=cfg.target_update_tau,
      reward_scale_factor=cfg.reward_scale_factor)
  replay = UniformReplay(tj.trajectory_spec(tss, asp),
                         batch_size=cfg.env_batch_size,
                         max_length=cfg.replay_capacity)
  loop = AsyncHostDeviceTrainLoop(
      env, agent, replay, sample_batch_size=cfg.sample_batch_size,
      train_steps_per_call=cfg.train_steps_per_call,
      utd_ratio=cfg.utd_ratio,
      min_replay_frames=cfg.initial_collect_ticks * cfg.env_batch_size,
      py_metrics=[py_metrics.AverageReturnMetric(20),
                  py_metrics.EnvironmentSteps(),
                  py_metrics.NumberOfEpisodes()])

  from agents_tpu.eval import metric_utils
  from agents_tpu.policies.jitted_py_policy import JittedPyPolicy

  eval_env = BatchedPyEnvironment(
      [suite_gym.load(cfg.env_name) for _ in range(cfg.num_eval_envs)])
  eval_policy = JittedPyPolicy(agent.policy)

  def run_eval(agent_state) -> float:
    eval_policy.update_params(agent.policy_params(agent_state))
    res = metric_utils.compute(
        [py_metrics.AverageReturnMetric(cfg.num_eval_episodes)],
        eval_env, eval_policy, num_episodes=cfg.num_eval_episodes)
    return float(res["AverageReturn"])

  writer = JsonlSummaryWriter(os.path.join(cfg.root_dir, "train.jsonl"))
  t0 = time.time()

  def progress(l):
    ret = l.py_metrics[0].result()
    sps = (l._env_steps - l._session_start_steps) / (time.time() - t0)
    line = (f"env_steps={l._env_steps} train_steps={l._train_steps} "
            f"AverageReturn={ret:.0f} ({sps:.0f} env-steps/s)")
    writer.scalar("AverageReturn", ret, l._env_steps)
    writer.scalar("train_steps", l._train_steps, l._env_steps)
    # Eval cadence keyed to the absolute tick count (resume-safe, unlike
    # a per-session counter which would shift every eval after a resume).
    ticks = l._env_steps // cfg.env_batch_size
    if cfg.eval_every_ticks and ticks % cfg.eval_every_ticks == 0:
      eval_ret = run_eval(l._agent_state)
      writer.scalar("EvalAverageReturn", eval_ret, l._env_steps)
      line += f" EvalAverageReturn={eval_ret:.0f}"
    print(line, flush=True)

  ckpt = None
  if cfg.checkpoint_interval_ticks:
    from agents_tpu.train.checkpointer import Checkpointer
    ckpt = Checkpointer(os.path.join(cfg.root_dir, "checkpoints"),
                        max_to_keep=cfg.checkpoint_max_to_keep)

  out = loop.run(
      total_env_batch_steps=cfg.total_env_steps // cfg.env_batch_size,
      seed=cfg.seed,
      initial_random_steps=cfg.initial_collect_ticks,
      progress_fn=progress, progress_every=cfg.progress_every_ticks,
      checkpointer=ckpt,
      checkpoint_interval_ticks=cfg.checkpoint_interval_ticks,
      resume=cfg.resume)

  final_eval = run_eval(out["agent_state"])
  writer.scalar("EvalAverageReturn", final_eval, out["env_steps"])
  print(f"final greedy eval ({cfg.num_eval_episodes} episodes): "
        f"{final_eval:.0f}", flush=True)
  out["eval_average_return"] = final_eval

  saver = PolicySaver(agent.policy, train_step=out["train_steps"])
  saver.save(os.path.join(cfg.root_dir, "policies", "greedy_policy"),
             agent.policy_params(out["agent_state"]))
  return out


if __name__ == "__main__":
  from agents_tpu.utils import config as config_lib

  cfg = config_lib.parse_flags(Config())
  os.makedirs(cfg.root_dir, exist_ok=True)
  config_lib.save(cfg, os.path.join(cfg.root_dir, "config.json"))
  out = train_eval(cfg)
  print(json.dumps({
      "env_steps": out["env_steps"], "train_steps": out["train_steps"],
      "wall_s": round(out["wall_s"], 1),
      "final_average_return": out["metrics"]["AverageReturn"],
      "eval_average_return": out["eval_average_return"],
  }))
