"""DQN on CartPole: the BASELINE config, fully on-device.

The reference's classic in-graph train_eval
(``tf_agents/agents/dqn/examples/v2/train_eval.py:85``, hyperparameters
:94-127: 100k iterations, batch 64, lr 1e-3, eps 0.1, tau 0.05/period 5,
replay 100k) runs one env step + one train step per Python iteration at
CPU speed. Here the whole loop is a fused device program; 100k iterations
finish in under a minute.

Usage:
  python examples/dqn_cartpole.py [--cfg.num_iterations=20000] [--smoke]
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


@dataclasses.dataclass(frozen=True)
class Config:
  root_dir: str = "/tmp/agents_tpu/dqn_cartpole"
  env_batch_size: int = 32
  num_iterations: int = 20000
  initial_collect_steps: int = 100
  replay_capacity: int = 4096          # per env row (~131k frames total)
  sample_batch_size: int = 64
  learning_rate: float = 1e-3
  epsilon_greedy: float = 0.1
  gamma: float = 0.99
  target_update_tau: float = 0.05
  target_update_period: int = 5
  fc_layer_params: tuple = (100, 50)
  log_interval: int = 2000
  checkpoint_interval: int = 10000
  num_eval_episodes: int = 30
  seed: int = 0


def train_eval(cfg: Config):
  import optax

  from agents_tpu import metrics, networks
  from agents_tpu.agents.dqn import DqnAgent
  from agents_tpu.environments.classic.cartpole import CartPole
  from agents_tpu.environments.jax_environment import BatchedJaxEnv
  from agents_tpu.replay_buffers import UniformReplay
  from agents_tpu.train import (FusedTrainLoop, JsonlSummaryWriter, Learner,
                                PolicyCheckpointTrigger)
  from agents_tpu.trajectories import trajectory as tj
  from agents_tpu.utils import common

  env = BatchedJaxEnv(CartPole(), batch_size=cfg.env_batch_size)
  tss, asp = env.time_step_spec(), env.action_spec()
  qnet = networks.make_q_network(tss.observation, asp,
                                 fc_layer_params=cfg.fc_layer_params)
  agent = DqnAgent(tss, asp, qnet, optax.adam(cfg.learning_rate),
                   epsilon_greedy=cfg.epsilon_greedy, gamma=cfg.gamma,
                   target_update_tau=cfg.target_update_tau,
                   target_update_period=cfg.target_update_period,
                   td_errors_loss_fn=common.element_wise_squared_loss)
  replay = UniformReplay(tj.trajectory_spec(tss, asp),
                         batch_size=cfg.env_batch_size,
                         max_length=cfg.replay_capacity)
  loop = FusedTrainLoop(env, agent, replay,
                        metrics=metrics.standard_collect_metrics(20),
                        sample_batch_size=cfg.sample_batch_size)
  state = jax.jit(lambda k: loop.init(
      k, initial_collect_steps=cfg.initial_collect_steps))(
          jax.random.key(cfg.seed))

  writer = JsonlSummaryWriter(os.path.join(cfg.root_dir, "train.jsonl"))
  learner = Learner(cfg.root_dir, loop=loop, initial_state=state,
                    checkpoint_interval=cfg.checkpoint_interval,
                    summary_writer=writer)
  t0 = time.time()
  while learner.global_step < cfg.num_iterations:
    n = min(cfg.log_interval, cfg.num_iterations - learner.global_step)
    loss = learner.run(iterations=n)
    dq = jax.device_get(learner.state.metric_states[2].deque)
    valid = min(int(dq.count), dq.data.shape[0])
    avg_return = float(dq.data[:valid].mean()) if valid else 0.0
    sps = learner.global_step * cfg.env_batch_size / (time.time() - t0)
    print(f"iter {learner.global_step}: loss={loss:.4f} "
          f"AverageReturn={avg_return:.1f} ({sps:.0f} env-steps/s)",
          flush=True)
    writer.scalar("AverageReturn", avg_return, learner.global_step)
  learner.checkpoint()
  # Greedy-policy eval, the reference protocol (train_eval.py:306:
  # eager_compute over num_eval_episodes with the greedy policy).
  eval_out = loop.evaluate(learner.state, jax.random.key(cfg.seed + 101),
                           num_episodes=cfg.num_eval_episodes,
                           max_steps=2000)
  eval_return = float(np.asarray(eval_out["AverageReturn"]))
  writer.scalar("EvalAverageReturn", eval_return, learner.global_step)
  print(f"final greedy eval ({cfg.num_eval_episodes} episodes): "
        f"{eval_return:.1f}", flush=True)
  return avg_return, eval_return


if __name__ == "__main__":
  from agents_tpu.utils import config as config_lib

  cfg = Config()
  if "--smoke" in sys.argv:
    cfg = dataclasses.replace(cfg, num_iterations=2000, log_interval=500)
    sys.argv.remove("--smoke")
  cfg = config_lib.parse_flags(cfg)
  os.makedirs(cfg.root_dir, exist_ok=True)
  config_lib.save(cfg, os.path.join(cfg.root_dir, "config.json"))
  final, eval_return = train_eval(cfg)
  print(json.dumps({"final_average_return": final,
                    "eval_average_return": eval_return,
                    "seed": cfg.seed}))
