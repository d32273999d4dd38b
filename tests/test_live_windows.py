"""Live return-window regression tests: short trainings executed here,
asserted against pass windows — the PerfZero pattern
(``tf_agents/benchmark/{dqn,sac,ppo}_benchmark.py``) at suite-runnable
budgets. Unlike the committed-artifact provenance checks in
test_examples_smoke.py, these can actually regress.
"""
import jax
import numpy as np
import optax
import pytest

from agents_tpu import metrics, networks
from agents_tpu.benchmark import return_windows as rw
from agents_tpu.environments.jax_environment import BatchedJaxEnv
from agents_tpu.replay_buffers import UniformReplay
from agents_tpu.train import FusedTrainLoop, OnPolicyTrainLoop
from agents_tpu.trajectories import trajectory as tj
from agents_tpu.utils import common


def _avg_return(loop, state):
  return float(np.asarray(loop.results(state)["AverageReturn"]))


def test_dqn_cartpole_reference_config_live():
  """DQN at the BASELINE operating point (1 env, sample batch 64, replay
  100k, lr 1e-3, eps 0.1, tau 0.05 / period 5 —
  agents/dqn/examples/v2/train_eval.py:94-127) solves CartPole live."""
  from agents_tpu.agents.dqn import DqnAgent
  from agents_tpu.environments.classic.cartpole import CartPole

  env = BatchedJaxEnv(CartPole(), batch_size=1)
  tss, asp = env.time_step_spec(), env.action_spec()
  qnet = networks.make_q_network(tss.observation, asp,
                                 fc_layer_params=(100, 50))
  agent = DqnAgent(tss, asp, qnet, optax.adam(1e-3), epsilon_greedy=0.1,
                   target_update_tau=0.05, target_update_period=5,
                   gamma=0.99,
                   td_errors_loss_fn=common.element_wise_squared_loss)
  replay = UniformReplay(tj.trajectory_spec(tss, asp), batch_size=1,
                         max_length=100_000)
  loop = FusedTrainLoop(env, agent, replay,
                        metrics=metrics.standard_collect_metrics(20),
                        collect_steps_per_iteration=1,
                        sample_batch_size=64)
  state = jax.jit(lambda k: loop.init(k, initial_collect_steps=1000))(
      jax.random.key(0))
  run = jax.jit(lambda s: loop.run(s, 2000))
  points, it = [], 0
  while it < rw.DQN_CARTPOLE_REFERENCE_LIVE.step_budget:
    state, _ = run(state)
    it += 2000
    points.append((it, _avg_return(loop, state)))
    if points[-1][1] >= rw.DQN_CARTPOLE_REFERENCE_LIVE.min_return:
      break
  rw.assert_live_window(points, rw.DQN_CARTPOLE_REFERENCE_LIVE,
                        "dqn_cartpole_reference_config")


def test_ppo_cartpole_live():
  """PPO-clip CartPole (schulman17 shape) solves live."""
  from agents_tpu.agents.ppo import PPOAgent
  from agents_tpu.environments.classic.cartpole import CartPole

  env = BatchedJaxEnv(CartPole(), batch_size=32)
  tss, asp = env.time_step_spec(), env.action_spec()
  agent = PPOAgent(
      tss, asp, optax.adam(3e-4),
      networks.make_actor_distribution_network(tss.observation, asp,
                                               fc_layer_params=(64, 64)),
      networks.make_value_network(tss.observation,
                                  fc_layer_params=(64, 64)),
      num_epochs=10, num_minibatches=8, entropy_regularization=0.01)
  loop = OnPolicyTrainLoop(env, agent,
                           metrics.standard_collect_metrics(20),
                           rollout_length=128)
  state = jax.jit(loop.init)(jax.random.key(0))
  run = jax.jit(lambda s: loop.run(s, 10))
  points, it = [], 0
  while it < rw.PPO_CARTPOLE_LIVE.step_budget:
    state, _ = run(state)
    it += 10
    points.append((it, _avg_return(loop, state)))
    if points[-1][1] >= rw.PPO_CARTPOLE_LIVE.min_return:
      break
  rw.assert_live_window(points, rw.PPO_CARTPOLE_LIVE, "ppo_cartpole")


def test_sac_pendulum_live():
  """SAC on the device Pendulum reaches near-optimal control live (random
  play averages ~ -1500; the window floor is -250)."""
  from agents_tpu.agents.sac import SacAgent
  from agents_tpu.environments.classic.pendulum import Pendulum

  env = BatchedJaxEnv(Pendulum(), batch_size=8)
  tss, asp = env.time_step_spec(), env.action_spec()
  agent = SacAgent(
      tss, asp,
      critic_network=networks.make_critic_network(
          tss.observation, asp, joint_fc_layer_params=(64, 64)),
      actor_network=networks.make_sac_actor_network(
          tss.observation, asp, fc_layer_params=(64, 64)),
      actor_optimizer=optax.adam(3e-4), critic_optimizer=optax.adam(3e-4),
      alpha_optimizer=optax.adam(3e-4), target_update_tau=0.005,
      reward_scale_factor=1.0)
  replay = UniformReplay(tj.trajectory_spec(tss, asp), batch_size=8,
                         max_length=8192)
  loop = FusedTrainLoop(env, agent, replay,
                        metrics=metrics.standard_collect_metrics(20),
                        collect_steps_per_iteration=1,
                        sample_batch_size=256,
                        train_steps_per_iteration=4)
  state = jax.jit(lambda k: loop.init(k, initial_collect_steps=128))(
      jax.random.key(0))
  run = jax.jit(lambda s: loop.run(s, 250))
  points, it = [], 0
  while it < rw.SAC_PENDULUM_LIVE.step_budget:
    state, _ = run(state)
    it += 250
    points.append((it, _avg_return(loop, state)))
    if points[-1][1] >= rw.SAC_PENDULUM_LIVE.min_return:
      break
  rw.assert_live_window(points, rw.SAC_PENDULUM_LIVE, "sac_pendulum")
