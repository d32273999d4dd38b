"""Visual observation path: conv encoder + DQN on a synthetic image env
(covers the Atari network path without ALE)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from agents_tpu import networks, specs
from agents_tpu.agents.dqn import DqnAgent
from agents_tpu.trajectories import time_step as ts
from agents_tpu.trajectories import trajectory as tj

OBS = specs.BoundedArraySpec((12, 12, 4), np.uint8, 0, 255)
TSS = ts.time_step_spec(OBS)
ACT = specs.BoundedArraySpec((), np.int32, 0, 3)


def test_conv_dqn_trains():
  qnet = networks.make_q_network(
      OBS, ACT, conv_layer_params=((8, 3, 2), (16, 3, 2)),
      fc_layer_params=(32,))
  agent = DqnAgent(TSS, ACT, qnet, optax.adam(1e-3), gamma=0.99)
  state = agent.init(jax.random.key(0))
  B, T = 4, 2
  exp = tj.Trajectory(
      step_type=jnp.zeros((B, T), jnp.int32),
      observation=jax.random.randint(
          jax.random.key(1), (B, T, 12, 12, 4), 0, 256, jnp.int32
      ).astype(jnp.uint8),
      action=jnp.zeros((B, T), jnp.int32), policy_info=(),
      next_step_type=jnp.ones((B, T), jnp.int32),
      reward=jnp.ones((B, T)), discount=jnp.ones((B, T)))
  new_state, info = jax.jit(agent.train)(state, exp)
  assert np.isfinite(float(info.loss))
  step = ts.restart(jnp.zeros((2, 12, 12, 4), jnp.uint8), batch_size=2)
  out = agent.policy.action(agent.policy_params(new_state), step, (),
                            jax.random.key(2))
  assert np.asarray(out.action).shape == (2,)
