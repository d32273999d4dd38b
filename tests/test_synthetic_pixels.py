"""SyntheticPixels env: spec compliance + the conv DQN path it exists to
drive (bench.py conv_bench; reference proof point examples/dqn/mnih15)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from agents_tpu import metrics, networks
from agents_tpu.agents.dqn import DqnAgent
from agents_tpu.environments.classic.synthetic_pixels import SyntheticPixels
from agents_tpu.environments.jax_environment import BatchedJaxEnv
from agents_tpu.replay_buffers import UniformReplay
from agents_tpu.train import FusedTrainLoop
from agents_tpu.trajectories import trajectory as tj
from agents_tpu.utils import common


def test_specs_and_stepping():
  env = BatchedJaxEnv(SyntheticPixels(size=12, frames=2, num_actions=4,
                                      horizon=5), batch_size=3)
  state, ts0 = env.reset(jax.random.key(0))
  assert ts0.observation.shape == (3, 12, 12, 2)
  assert ts0.observation.dtype == jnp.uint8
  for i in range(6):
    a = jnp.asarray([i % 4] * 3, jnp.int32)
    state, tstep = env.step(state, ts0 if i == 0 else tstep, a,
                            jax.random.key(i + 1))
  obs = np.asarray(tstep.observation)
  assert obs.min() >= 0 and obs.max() <= 255


def test_conv_dqn_iteration_runs():
  B = 4
  env = BatchedJaxEnv(SyntheticPixels(size=12, frames=2, num_actions=4,
                                      horizon=16), batch_size=B)
  tss, asp = env.time_step_spec(), env.action_spec()
  qnet = networks.make_q_network(
      tss.observation, asp, conv_layer_params=((8, 3, 2), (8, 3, 1)),
      fc_layer_params=(32,), dtype=jnp.bfloat16,
      preprocessing=lambda x: x.astype(jnp.bfloat16) / 255.0)
  agent = DqnAgent(tss, asp, qnet, optax.adam(1e-3),
                   td_errors_loss_fn=common.element_wise_huber_loss)
  replay = UniformReplay(tj.trajectory_spec(tss, asp), batch_size=B,
                         max_length=64)
  loop = FusedTrainLoop(env, agent, replay,
                        metrics=metrics.standard_collect_metrics(8),
                        sample_batch_size=16)
  state = jax.jit(lambda k: loop.init(k, initial_collect_steps=8))(
      jax.random.key(0))
  state, losses = jax.jit(lambda s: loop.run(s, 10))(state)
  assert np.isfinite(np.asarray(losses)).all()
  # uint8 stays uint8 in storage (no accidental float upcast of frames).
  assert state.replay_state.storage.observation.dtype == jnp.uint8
