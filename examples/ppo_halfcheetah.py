"""PPO-Clip on MuJoCo HalfCheetah (schulman17 config shape).

Analogue of ``tf_agents/examples/ppo/schulman17/ppo_clip_train_eval.py``:
host MuJoCo stepping + fused on-device PPO update per rollout.
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@dataclasses.dataclass(frozen=True)
class Config:
  """Defaults = the schulman17 operating point exactly
  (train_eval_lib.py:85-113 + ppo_benchmark.py:92): ONE environment,
  2048-step rollouts, minibatch 64 x 10 epochs, gradient clipping 0.5,
  linear LR decay to zero over 489 iterations ~= 1M transitions."""
  root_dir: str = "/tmp/agents_tpu/ppo_halfcheetah"
  env_name: str = "HalfCheetah-v5"
  env_batch_size: int = 1
  rollout_length: int = 2049         # trains on T-1 = 2048 frames
  num_iterations: int = 489          # x 2048 ~= 1M transitions
  num_epochs: int = 10
  num_minibatches: int = 32          # 2048 / 32 = minibatch 64
  learning_rate: float = 3e-4
  importance_ratio_clipping: float = 0.2
  lambda_value: float = 0.95
  discount_factor: float = 0.99
  entropy_regularization: float = 0.0
  gradient_clipping: float = 0.5
  actor_fc_layers: tuple = (64, 64)
  value_fc_layers: tuple = (64, 64)
  log_interval: int = 10
  # Greedy-eval protocol (reference eval: 30 episodes, greedy policy).
  num_eval_episodes: int = 30
  num_eval_envs: int = 10
  eval_every_iterations: int = 120
  seed: int = 0


def train_eval(cfg: Config):
  import jax
  import numpy as np
  import optax

  from agents_tpu import networks
  from agents_tpu.agents.ppo import PPOClipAgent
  from agents_tpu.environments import suite_gym
  from agents_tpu.environments.batched_py_environment import (
      BatchedPyEnvironment,)
  import flax.linen as nn

  from agents_tpu.eval import metric_utils
  from agents_tpu.metrics import py_metrics
  from agents_tpu.policies.jitted_py_policy import JittedPyPolicy
  from agents_tpu.train import HostOnPolicyTrainLoop, JsonlSummaryWriter

  env = BatchedPyEnvironment(
      [suite_gym.load(cfg.env_name) for _ in range(cfg.env_batch_size)])
  tss, asp = env.time_step_spec(), env.action_spec()
  # schulman17 operating point (train_eval_lib.py:90-201): tanh MLPs,
  # Adam eps 1e-5, learning rate linearly decayed to 0 over training.
  lr_schedule = optax.linear_schedule(
      cfg.learning_rate, 0.0,
      cfg.num_iterations * cfg.num_epochs * cfg.num_minibatches)
  # schulman17 actor head: state-independent std initialized at 0.35
  # (ppo_actor_network.py:78-82 std_bias_initializer_value =
  # log(exp(0.35) - 1) behind a softplus).
  import functools
  import math

  from agents_tpu.networks.projection_networks import NormalProjection
  proj = functools.partial(
      NormalProjection,
      std_bias_initializer_value=math.log(math.exp(0.35) - 1.0))
  agent = PPOClipAgent(
      tss, asp, optax.adam(lr_schedule, eps=1e-5),
      networks.make_actor_distribution_network(
          tss.observation, asp, fc_layer_params=cfg.actor_fc_layers,
          activation=nn.tanh, continuous_projection=proj),
      networks.make_value_network(tss.observation,
                                  fc_layer_params=cfg.value_fc_layers,
                                  activation=nn.tanh),
      importance_ratio_clipping=cfg.importance_ratio_clipping,
      discount_factor=cfg.discount_factor,
      lambda_value=cfg.lambda_value, num_epochs=cfg.num_epochs,
      num_minibatches=cfg.num_minibatches,
      entropy_regularization=cfg.entropy_regularization,
      gradient_clipping=cfg.gradient_clipping or None)
  loop = HostOnPolicyTrainLoop(
      env, agent, rollout_length=cfg.rollout_length,
      py_metrics=[py_metrics.AverageReturnMetric(20),
                  py_metrics.EnvironmentSteps()])
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
  agent_state, time_step = loop.init(cfg.seed)
  key = jax.random.key(cfg.seed + 1)
  t0 = time.time()
  ret = 0.0
  for it in range(1, cfg.num_iterations + 1):
    agent_state, time_step, key, info = loop.run_iteration(
        agent_state, time_step, key)
    if it % cfg.log_interval == 0:
      results = loop.metric_results()
      ret = results["AverageReturn"]
      steps = results["EnvironmentSteps"]
      print(f"iter {it}: env_steps={steps} AverageReturn={ret:.0f} "
            f"loss={float(info.loss):.3f} "
            f"({steps/(time.time()-t0):.0f} env-steps/s)", flush=True)
      writer.scalar("AverageReturn", ret, steps)
    if cfg.eval_every_iterations and it % cfg.eval_every_iterations == 0:
      eval_ret = run_eval(agent_state)
      steps = loop.metric_results()["EnvironmentSteps"]
      writer.scalar("EvalAverageReturn", eval_ret, steps)
      print(f"iter {it}: EvalAverageReturn={eval_ret:.0f}", flush=True)
  final_eval = run_eval(agent_state)
  steps = loop.metric_results()["EnvironmentSteps"]
  writer.scalar("EvalAverageReturn", final_eval, steps)
  return {"collect_return": ret, "eval_average_return": final_eval,
          "env_steps": int(steps), "wall_s": time.time() - t0}


if __name__ == "__main__":
  from agents_tpu.utils import config as config_lib

  cfg = config_lib.parse_flags(Config())
  os.makedirs(cfg.root_dir, exist_ok=True)
  config_lib.save(cfg, os.path.join(cfg.root_dir, "config.json"))
  out = train_eval(cfg)
  print(json.dumps(out))
