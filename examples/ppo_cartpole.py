"""PPO-Clip on CartPole, fully on-device (schulman17-style loop).

Analogue of ``tf_agents/examples/ppo/schulman17/ppo_clip_train_eval.py``
scaled to the pure-JAX env: rollout collection, GAE, normalizers, and the
epoch/minibatch update are one fused device program per iteration.
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@dataclasses.dataclass(frozen=True)
class Config:
  root_dir: str = "/tmp/agents_tpu/ppo_cartpole"
  env_batch_size: int = 32
  rollout_length: int = 128
  num_iterations: int = 200
  num_epochs: int = 10
  num_minibatches: int = 8
  learning_rate: float = 3e-4
  entropy_regularization: float = 0.01
  importance_ratio_clipping: float = 0.2
  discount_factor: float = 0.99
  lambda_value: float = 0.95
  actor_fc_layers: tuple = (64, 64)
  value_fc_layers: tuple = (64, 64)
  log_interval: int = 20


def train_eval(cfg: Config):
  import jax
  import numpy as np
  import optax

  from agents_tpu import metrics, networks
  from agents_tpu.agents.ppo import PPOAgent
  from agents_tpu.environments.classic.cartpole import CartPole
  from agents_tpu.environments.jax_environment import BatchedJaxEnv
  from agents_tpu.train import OnPolicyTrainLoop

  env = BatchedJaxEnv(CartPole(), batch_size=cfg.env_batch_size)
  tss, asp = env.time_step_spec(), env.action_spec()
  agent = PPOAgent(
      tss, asp, optax.adam(cfg.learning_rate),
      networks.make_actor_distribution_network(
          tss.observation, asp, fc_layer_params=cfg.actor_fc_layers),
      networks.make_value_network(tss.observation,
                                  fc_layer_params=cfg.value_fc_layers),
      importance_ratio_clipping=cfg.importance_ratio_clipping,
      discount_factor=cfg.discount_factor, lambda_value=cfg.lambda_value,
      num_epochs=cfg.num_epochs, num_minibatches=cfg.num_minibatches,
      entropy_regularization=cfg.entropy_regularization)
  loop = OnPolicyTrainLoop(env, agent,
                           metrics.standard_collect_metrics(20),
                           rollout_length=cfg.rollout_length)
  state = jax.jit(loop.init)(jax.random.key(0))
  run = jax.jit(lambda s: loop.run(s, cfg.log_interval))

  t0, it, avg_return = time.time(), 0, 0.0
  while it < cfg.num_iterations:
    state, losses = run(state)
    it += cfg.log_interval
    dq = jax.device_get(state.metric_states[2].deque)
    valid = min(int(dq.count), dq.data.shape[0])
    avg_return = float(dq.data[:valid].mean()) if valid else 0.0
    sps = it * cfg.rollout_length * cfg.env_batch_size / (time.time() - t0)
    print(f"iter {it}: loss={float(np.asarray(losses)[-1]):.4f} "
          f"AverageReturn={avg_return:.1f} ({sps:.0f} env-steps/s)",
          flush=True)
  return avg_return


if __name__ == "__main__":
  from agents_tpu.utils import config as config_lib

  cfg = config_lib.parse_flags(Config())
  os.makedirs(cfg.root_dir, exist_ok=True)
  final = train_eval(cfg)
  print(json.dumps({"final_average_return": final}))
