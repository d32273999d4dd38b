"""Round-5 TPU verify drive: exercise the public API end-to-end on the real
chip — jitted rollout with auto-reset protocol checks, then the fused
collect+train loop long enough to see the loss move and CartPole return rise.

This is the library-surface drive the verify skill prescribes (not a unit
test): everything here runs on the default (TPU) backend, synchronizes via
real value readback (block_until_ready is a no-op on the axon backend), and
prints a one-line JSON verdict at the end.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from agents_tpu import metrics, networks
from agents_tpu.agents.dqn import DqnAgent
from agents_tpu.environments.classic.cartpole import CartPole
from agents_tpu.environments.jax_environment import BatchedJaxEnv
from agents_tpu.replay_buffers import UniformReplay
from agents_tpu.train import FusedTrainLoop
from agents_tpu.trajectories import time_step as ts
from agents_tpu.trajectories import trajectory as tj
from agents_tpu.utils import common


def check_rollout_protocol():
  """Jitted 64-step random rollout on TPU: every post-LAST frame must be
  FIRST (auto-reset), rewards finite, observations in spec bounds."""
  B, T = 32, 64
  env = BatchedJaxEnv(CartPole(), batch_size=B)

  def rollout(key):
    k0, key = jax.random.split(key)
    state, time_step = env.reset(k0)

    def body(carry, k):
      state, time_step = carry
      ka, ks = jax.random.split(k)
      action = jax.random.randint(ka, (B,), 0, 2)
      state, next_ts = env.step(state, time_step, action, ks)
      return (state, next_ts), next_ts.step_type

    (_, _), types = jax.lax.scan(body, (state, time_step),
                                 jax.random.split(key, T))
    return types  # [T, B]

  types = np.asarray(jax.jit(rollout)(jax.random.key(0)))
  # Protocol: a LAST at t must be followed by FIRST at t+1 in that row.
  last_mask = types[:-1] == int(ts.StepType.LAST)
  after_last = types[1:][last_mask]
  assert last_mask.sum() > 0, "64-step random CartPole rollout saw no LAST"
  assert (after_last == int(ts.StepType.FIRST)).all(), (
      "post-LAST frame is not FIRST", np.unique(after_last))
  # And no two consecutive LASTs anywhere.
  assert not ((types[:-1] == 2) & (types[1:] == 2)).any()
  return int(last_mask.sum())


def check_fused_training():
  """Fused DQN on CartPole: loss finite, average return rises well above
  the random-policy floor (~20) within ~3k iterations at B=512."""
  B = 512
  env = BatchedJaxEnv(CartPole(), batch_size=B)
  tss, asp = env.time_step_spec(), env.action_spec()
  qnet = networks.make_q_network(tss.observation, asp,
                                 fc_layer_params=(100, 50))
  agent = DqnAgent(tss, asp, qnet, optax.adam(1e-3), epsilon_greedy=0.1,
                   target_update_tau=0.05, target_update_period=5,
                   gamma=0.99,
                   td_errors_loss_fn=common.element_wise_squared_loss)
  replay = UniformReplay(tj.trajectory_spec(tss, asp), batch_size=B,
                         max_length=512)
  loop = FusedTrainLoop(env, agent, replay,
                        metrics=metrics.standard_collect_metrics(20),
                        collect_steps_per_iteration=1,
                        sample_batch_size=256)
  state = jax.jit(
      lambda k: loop.init(k, initial_collect_steps=100))(jax.random.key(1))
  run = jax.jit(lambda s: loop.run(s, 500))

  def avg_return(st):
    dq = jax.device_get(st.metric_states[2].deque)
    n = min(int(dq.count), dq.data.shape[0])
    return float(dq.data[:n].mean()) if n else 0.0

  state, losses = run(state)
  first_loss = float(np.asarray(losses)[-1])  # readback = sync
  early_return = avg_return(state)
  t0 = time.time()
  for _ in range(6):
    state, losses = run(state)
  last_loss = float(np.asarray(losses)[-1])
  dt = time.time() - t0
  late_return = avg_return(state)
  assert np.isfinite(first_loss) and np.isfinite(last_loss), (
      first_loss, last_loss)
  assert late_return > max(100.0, early_return + 20.0), (
      "return did not rise", early_return, late_return)
  return {
      "early_return": round(early_return, 1),
      "late_return": round(late_return, 1),
      "env_steps_per_s": round(6 * 500 * B / dt, 0),
  }


def main():
  dev = jax.devices()[0]
  n_last = check_rollout_protocol()
  train = check_fused_training()
  print(json.dumps({
      "drive": "r5",
      "ok": True,
      "device": str(dev),
      "rollout_episode_ends_seen": n_last,
      **train,
  }))


if __name__ == "__main__":
  main()
