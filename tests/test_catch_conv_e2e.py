"""On-device Catch env + conv DQN end-to-end: the Atari-path exercise
that works without ale-py (pixel observation -> conv Q-net -> fused
train loop -> positive average return)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from agents_tpu import metrics, networks
from agents_tpu.agents.dqn import DqnAgent
from agents_tpu.environments.classic.catch import Catch
from agents_tpu.environments.jax_environment import BatchedJaxEnv
from agents_tpu.replay_buffers import UniformReplay
from agents_tpu.train import FusedTrainLoop
from agents_tpu.trajectories import trajectory as tj
from agents_tpu.utils import common


def test_catch_env_mechanics():
  env = Catch(rows=5, columns=3)
  state, first = env.reset(jax.random.key(3))
  assert first.observation.shape == (5, 3, 1)
  assert float(jnp.sum(first.observation)) == 2.0  # ball + paddle
  # Episode lasts rows-1 = 4 steps; stay still and track reward.
  rewards = []
  step = first
  for _ in range(4):
    state, step = env.step(state, jnp.asarray(1, jnp.int32),
                           jax.random.key(0))
    rewards.append(float(step.reward))
  assert int(step.step_type) == 2 and float(step.discount) == 0.0
  assert rewards[:-1] == [0.0, 0.0, 0.0] and rewards[-1] in (-1.0, 1.0)


def test_catch_perfect_policy_catches():
  """Moving toward the ball column always catches: reward +1."""
  env = Catch(rows=6, columns=5)
  state, step = env.reset(jax.random.key(1))
  for _ in range(5):
    ball = state.ball_col
    paddle = state.paddle_col
    action = jnp.sign(ball - paddle) + 1  # left/stay/right
    state, step = env.step(state, action.astype(jnp.int32),
                           jax.random.key(0))
  assert float(step.reward) == 1.0


def test_conv_dqn_learns_catch():
  """Fused loop with a conv Q-network reaches positive return (random
  play averages ~ -0.6; a competent paddle gets near +1)."""
  B = 64
  env = BatchedJaxEnv(Catch(rows=8, columns=5), batch_size=B)
  tss, asp = env.time_step_spec(), env.action_spec()
  qnet = networks.make_q_network(
      tss.observation, asp, conv_layer_params=((8, 3, 1),),
      fc_layer_params=(64,))
  agent = DqnAgent(tss, asp, qnet, optax.adam(1e-3), epsilon_greedy=0.1,
                   target_update_tau=1.0, target_update_period=50,
                   gamma=0.99,
                   td_errors_loss_fn=common.element_wise_squared_loss)
  replay = UniformReplay(tj.trajectory_spec(tss, asp), batch_size=B,
                         max_length=256)
  loop = FusedTrainLoop(env, agent, replay,
                        metrics=metrics.standard_collect_metrics(100),
                        sample_batch_size=128)
  state = jax.jit(lambda k: loop.init(k, initial_collect_steps=32))(
      jax.random.key(0))
  run = jax.jit(lambda s: loop.run(s, 400))
  ret = -1.0
  for _ in range(6):
    state, _ = run(state)
    dq = jax.device_get(state.metric_states[2].deque)
    n = min(int(dq.count), dq.data.shape[0])
    ret = float(dq.data[:n].mean()) if n else -1.0
    if ret > 0.5:
      break
  assert ret > 0.3, f"conv DQN failed to learn Catch (return {ret})"
