"""Contextual-bandit training scenarios, fully on-device.

Analogue of the reference's 13 scenario binaries
(``tf_agents/bandits/agents/examples/v2/train_eval_*.py``) and their
shared trainer loop (``examples/v2/trainer.py:67-120``): each scenario
wires an environment + agent + regret metrics into `OnPolicyTrainLoop`
(rollout_length=2 = the length-1-episode cadence) — but where the
reference steps a TF env and trains per Python iteration, here the whole
round (collect -> train -> metrics) is one jitted program and thousands
of bandit instances run in lockstep per device.

Usage:
  python examples/bandits_train_eval.py --scenario=linucb_stationary
  python examples/bandits_train_eval.py --list
  python examples/bandits_train_eval.py --scenario=wheel \
      --cfg.num_rounds=2000 --cfg.env_batch_size=512
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Config:
  root_dir: str = "/tmp/agents_tpu/bandits"
  env_batch_size: int = 256
  num_rounds: int = 1000
  log_interval: int = 200
  learning_rate: float = 1e-2
  epsilon: float = 0.1
  linucb_alpha: float = 1.0
  context_dim: int = 8
  num_arms: int = 5
  noise_std: float = 0.1
  seed: int = 0


def _linear_env(cfg):
  from agents_tpu.bandits.environments import StationaryStochasticBandit
  theta = np.random.default_rng(cfg.seed).normal(
      size=(cfg.num_arms, cfg.context_dim)).astype(np.float32)
  return StationaryStochasticBandit(theta, noise_std=cfg.noise_std)


def _reward_net(env, cfg, layers=(64, 64)):
  from agents_tpu import networks
  from agents_tpu.trajectories import time_step as ts
  tss = ts.time_step_spec(env.observation_spec())
  return networks.make_q_network(tss.observation, env.action_spec(),
                                 fc_layer_params=layers)


# ---------------------------------------------------------------------------
# Scenario registry: name -> (env, agent) builder. Mirrors the reference's
# per-scenario binaries (train_eval_{lin_ucb,lin_ts,eps_greedy,boltzmann,
# falcon,dropout_ts,bernoulli_ts,exp3,wheel,drifting,piecewise,movielens,
# per_arm,ranking}.py).
# ---------------------------------------------------------------------------

def _linucb_stationary(cfg):
  from agents_tpu.bandits.agents import LinUcbAgent
  from agents_tpu.trajectories import time_step as ts
  env = _linear_env(cfg)
  agent = LinUcbAgent(ts.time_step_spec(env.observation_spec()),
                      env.action_spec(), alpha=cfg.linucb_alpha)
  return env, agent


def _lints_stationary(cfg):
  from agents_tpu.bandits.agents import LinearThompsonSamplingAgent
  from agents_tpu.trajectories import time_step as ts
  env = _linear_env(cfg)
  agent = LinearThompsonSamplingAgent(
      ts.time_step_spec(env.observation_spec()), env.action_spec(),
      alpha=cfg.linucb_alpha)
  return env, agent


def _neural_eps_greedy(cfg):
  import optax
  from agents_tpu.bandits.agents import NeuralEpsilonGreedyAgent
  from agents_tpu.trajectories import time_step as ts
  env = _linear_env(cfg)
  net = _reward_net(env, cfg)
  agent = NeuralEpsilonGreedyAgent(
      ts.time_step_spec(env.observation_spec()), env.action_spec(), net,
      optax.adam(cfg.learning_rate), epsilon=cfg.epsilon)
  return env, agent


def _neural_boltzmann(cfg):
  import optax
  from agents_tpu.bandits.agents import NeuralBoltzmannAgent
  from agents_tpu.trajectories import time_step as ts
  env = _linear_env(cfg)
  net = _reward_net(env, cfg)
  agent = NeuralBoltzmannAgent(
      ts.time_step_spec(env.observation_spec()), env.action_spec(), net,
      optax.adam(cfg.learning_rate), temperature=0.5)
  return env, agent


def _neural_falcon(cfg):
  import optax
  from agents_tpu.bandits.agents import NeuralFalconAgent
  from agents_tpu.trajectories import time_step as ts
  env = _linear_env(cfg)
  net = _reward_net(env, cfg)
  agent = NeuralFalconAgent(
      ts.time_step_spec(env.observation_spec()), env.action_spec(), net,
      optax.adam(cfg.learning_rate))
  return env, agent


def _neural_linucb(cfg):
  import optax
  from agents_tpu import networks
  from agents_tpu.bandits.agents import NeuralLinUcbAgent
  from agents_tpu.trajectories import time_step as ts
  env = _linear_env(cfg)
  enc = networks.make_encoding_network(env.observation_spec(),
                                       fc_layer_params=(16,))
  agent = NeuralLinUcbAgent(
      ts.time_step_spec(env.observation_spec()), env.action_spec(), enc,
      encoding_dim=16, optimizer=optax.adam(cfg.learning_rate),
      alpha=cfg.linucb_alpha)
  return env, agent


def _dropout_ts(cfg):
  import flax.linen as nn
  import optax
  from agents_tpu.bandits.agents import DropoutThompsonSamplingAgent
  from agents_tpu.networks.network import Network
  from agents_tpu.trajectories import time_step as ts
  env = _linear_env(cfg)
  num_actions = env.action_spec().num_values

  class _DropNet(nn.Module):
    @nn.compact
    def __call__(self, obs, step_type=None, state=(), training=False):
      x = nn.relu(nn.Dense(64)(obs.astype(jnp.float32)))
      x = nn.Dropout(0.1, deterministic=not training)(x)
      return nn.Dense(num_actions)(x), state

  net = Network(_DropNet(), env.observation_spec())
  agent = DropoutThompsonSamplingAgent(
      ts.time_step_spec(env.observation_spec()), env.action_spec(), net,
      optax.adam(cfg.learning_rate))
  return env, agent


def _bernoulli_ts(cfg):
  from agents_tpu.bandits.agents import BernoulliThompsonSamplingAgent
  from agents_tpu.bandits.environments import BernoulliBandit
  from agents_tpu.trajectories import time_step as ts
  env = BernoulliBandit([0.3, 0.5, 0.7, 0.65])
  agent = BernoulliThompsonSamplingAgent(
      ts.time_step_spec(env.observation_spec()), env.action_spec())
  return env, agent


def _exp3(cfg):
  from agents_tpu.bandits.agents import Exp3Agent
  from agents_tpu.bandits.environments import BernoulliBandit
  from agents_tpu.trajectories import time_step as ts
  env = BernoulliBandit([0.2, 0.8, 0.5])
  agent = Exp3Agent(ts.time_step_spec(env.observation_spec()),
                    env.action_spec(), learning_rate=0.05)
  return env, agent


def _exp3_mixture(cfg):
  from agents_tpu.bandits.agents import (BernoulliThompsonSamplingAgent,
                                         Exp3Agent, Exp3MixtureAgent)
  from agents_tpu.bandits.environments import BernoulliBandit
  from agents_tpu.trajectories import time_step as ts
  env = BernoulliBandit([0.2, 0.8, 0.5])
  tss = ts.time_step_spec(env.observation_spec())
  subs = [Exp3Agent(tss, env.action_spec(), learning_rate=0.05),
          BernoulliThompsonSamplingAgent(tss, env.action_spec())]
  agent = Exp3MixtureAgent(tss, env.action_spec(), subs,
                           learning_rate=0.05)
  return env, agent


def _wheel(cfg):
  import optax
  from agents_tpu.bandits.agents import NeuralEpsilonGreedyAgent
  from agents_tpu.bandits.environments import WheelBandit
  from agents_tpu.trajectories import time_step as ts
  env = WheelBandit(delta=0.5)
  net = _reward_net(env, cfg)
  agent = NeuralEpsilonGreedyAgent(
      ts.time_step_spec(env.observation_spec()), env.action_spec(), net,
      optax.adam(cfg.learning_rate), epsilon=cfg.epsilon)
  return env, agent


def _drifting(cfg):
  from agents_tpu.bandits.agents import LinUcbAgent
  from agents_tpu.bandits.environments import DriftingLinearBandit
  from agents_tpu.trajectories import time_step as ts
  theta = np.random.default_rng(cfg.seed).normal(
      size=(cfg.num_arms, cfg.context_dim)).astype(np.float32)
  env = DriftingLinearBandit(theta, drift_rate=0.005,
                             noise_std=cfg.noise_std)
  # gamma<1 = forgetting factor for non-stationarity (reference
  # linear_bandit_agent.py:127).
  agent = LinUcbAgent(ts.time_step_spec(env.observation_spec()),
                      env.action_spec(), alpha=cfg.linucb_alpha,
                      gamma=0.995)
  return env, agent


def _piecewise(cfg):
  import optax
  from agents_tpu.bandits.agents import NeuralEpsilonGreedyAgent
  from agents_tpu.bandits.environments import (
      PiecewiseStationaryStochasticBandit)
  from agents_tpu.trajectories import time_step as ts
  env = PiecewiseStationaryStochasticBandit(
      context_dim=cfg.context_dim, num_arms=cfg.num_arms, num_pieces=4,
      durations=[max(cfg.num_rounds // 4, 1)], seed=cfg.seed,
      horizon=max(cfg.num_rounds * 2, 64))
  net = _reward_net(env, cfg)
  agent = NeuralEpsilonGreedyAgent(
      ts.time_step_spec(env.observation_spec()), env.action_spec(), net,
      optax.adam(cfg.learning_rate), epsilon=cfg.epsilon)
  return env, agent


def _movielens(cfg):
  import optax
  from agents_tpu.bandits.agents import NeuralEpsilonGreedyAgent
  from agents_tpu.bandits.environments import (MovieLensBandit,
                                               synthetic_ratings_matrix)
  from agents_tpu.trajectories import time_step as ts
  ratings = synthetic_ratings_matrix(256, 64, rank=6, seed=cfg.seed)
  env = MovieLensBandit(ratings, rank_k=6, num_movies=20)
  net = _reward_net(env, cfg)
  agent = NeuralEpsilonGreedyAgent(
      ts.time_step_spec(env.observation_spec()), env.action_spec(), net,
      optax.adam(cfg.learning_rate), epsilon=cfg.epsilon)
  return env, agent


def _per_arm(cfg):
  import optax
  from agents_tpu.bandits.agents import NeuralEpsilonGreedyAgent
  from agents_tpu.bandits.environments import (
      StationaryStochasticPerArmBandit)
  from agents_tpu.bandits.networks.global_and_arm_feature_network import (
      make_global_and_arm_feature_network)
  from agents_tpu.bandits.specs.bandit_spec_utils import (
      create_per_arm_observation_spec)
  from agents_tpu.trajectories import time_step as ts
  gdim, adim, k = 4, 3, 6
  theta = np.random.default_rng(cfg.seed).normal(
      size=(gdim + adim,)).astype(np.float32)
  env = StationaryStochasticPerArmBandit(
      global_sampling_fn=lambda key: jax.random.uniform(
          key, (gdim,), jnp.float32, -1, 1),
      arm_sampling_fn=lambda key: jax.random.uniform(
          key, (adim,), jnp.float32, -1, 1),
      reward_fn=lambda x, key: x @ theta + cfg.noise_std
      * jax.random.normal(key),
      expected_reward_fn=lambda x: x @ theta,
      global_dim=gdim, arm_dim=adim, max_num_actions=k)
  spec = create_per_arm_observation_spec(gdim, adim, k)
  net = make_global_and_arm_feature_network(spec)
  agent = NeuralEpsilonGreedyAgent(
      ts.time_step_spec(spec), env.action_spec(), net,
      optax.adam(cfg.learning_rate), epsilon=cfg.epsilon)
  return env, agent


def _ranking(cfg):
  import optax
  from agents_tpu.bandits.agents import RankingAgent
  from agents_tpu.bandits.environments import (ClickModel, FeedbackModel,
                                               RankingBanditEnv)
  from agents_tpu.bandits.networks.global_and_arm_feature_network import (
      make_global_and_arm_feature_network)
  from agents_tpu.bandits.specs.bandit_spec_utils import (
      create_per_arm_observation_spec)
  from agents_tpu.trajectories import time_step as ts
  gdim, idim, items, slots = 3, 2, 8, 3
  w = np.random.default_rng(cfg.seed).normal(
      size=(idim, gdim)).astype(np.float32)
  env = RankingBanditEnv(
      global_sampling_fn=lambda key: jax.random.normal(key, (gdim,)),
      item_sampling_fn=lambda key: jax.random.normal(key, (idim,)),
      num_items=items, num_slots=slots, scores_weight_matrix=w,
      global_dim=gdim, item_dim=idim,
      feedback_model=FeedbackModel.SCORE_VECTOR,
      click_model=ClickModel.GHOST_ACTIONS)
  spec = create_per_arm_observation_spec(gdim, idim, items)
  net = make_global_and_arm_feature_network(spec)
  agent = RankingAgent(ts.time_step_spec(spec), env.action_spec(), net,
                       optax.adam(cfg.learning_rate), slate_size=slots,
                       diversity_penalty=0.1)
  return env, agent


SCENARIOS = {
    "linucb_stationary": _linucb_stationary,
    "lints_stationary": _lints_stationary,
    "neural_eps_greedy": _neural_eps_greedy,
    "neural_boltzmann": _neural_boltzmann,
    "neural_falcon": _neural_falcon,
    "neural_linucb": _neural_linucb,
    "dropout_ts": _dropout_ts,
    "bernoulli_ts": _bernoulli_ts,
    "exp3": _exp3,
    "exp3_mixture": _exp3_mixture,
    "wheel": _wheel,
    "drifting": _drifting,
    "piecewise": _piecewise,
    "movielens": _movielens,
    "per_arm": _per_arm,
    "ranking": _ranking,
}


def train_eval(cfg: Config, scenario: str):
  from agents_tpu.bandits.metrics import (RegretMetric,
                                          SuboptimalArmsMetric)
  from agents_tpu.environments.jax_environment import BatchedJaxEnv
  from agents_tpu.train import OnPolicyTrainLoop

  env1, agent = SCENARIOS[scenario](cfg)
  env = BatchedJaxEnv(env1, batch_size=cfg.env_batch_size)

  metrics = []
  try:
    env1.optimal_reward_fn(
        jax.tree_util.tree_map(
            lambda s: jnp.zeros((1,) + tuple(s.shape),
                                s.dtype), env1.observation_spec()))
    metrics.append(RegretMetric(env1.optimal_reward_fn))
  except NotImplementedError:
    pass
  try:
    env1.optimal_action_fn(
        jax.tree_util.tree_map(
            lambda s: jnp.zeros((1,) + tuple(s.shape),
                                s.dtype), env1.observation_spec()))
    metrics.append(SuboptimalArmsMetric(env1.optimal_action_fn))
  except (NotImplementedError, AttributeError):
    pass

  loop = OnPolicyTrainLoop(env, agent, tuple(metrics), rollout_length=2)
  state = loop.init(jax.random.key(cfg.seed))
  run = jax.jit(lambda s, n: loop.run(s, n), static_argnums=1)

  os.makedirs(cfg.root_dir, exist_ok=True)
  log_path = os.path.join(cfg.root_dir, f"{scenario}.jsonl")
  done = 0
  t0 = time.time()
  with open(log_path, "w") as f:
    while done < cfg.num_rounds:
      n = min(cfg.log_interval, cfg.num_rounds - done)
      # Reset metric windows each interval so regret reflects the
      # current policy, matching the reference's per-interval export
      # (trainer.py `_export_metrics_and_summaries`:83).
      state = state.replace(metric_states=tuple(
          m.init(cfg.env_batch_size) for m in metrics))
      state, _ = run(state, n)
      done += n
      results = {k: float(v) for k, v in loop.results(state).items()}
      rec = {"scenario": scenario, "round": done,
             "rounds_per_s": round(done * cfg.env_batch_size
                                   / (time.time() - t0), 1), **results}
      f.write(json.dumps(rec) + "\n")
      print(json.dumps(rec))
  return state


def main(argv):
  from agents_tpu.utils.config import parse_flags
  if "--list" in argv:
    print("\n".join(SCENARIOS))
    return
  scenario = "linucb_stationary"
  rest = []
  for a in argv:
    if a.startswith("--scenario="):
      scenario = a.split("=", 1)[1]
    else:
      rest.append(a)
  if scenario not in SCENARIOS:
    raise SystemExit(f"unknown scenario {scenario}; use --list")
  cfg = parse_flags(Config(), rest)
  train_eval(cfg, scenario)


if __name__ == "__main__":
  main(sys.argv[1:])
