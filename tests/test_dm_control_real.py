"""REAL dm_control backend tests (the image ships dm_control + dm_env —
previously assumed absent; these prove the adapter against the actual
physics engine, not the duck-typed fake).

Reference surface being mirrored:
``tf_agents/environments/suite_dm_control.py:30`` (load) and
``dm_control_wrapper.py:33-140`` (spec/time-step conversion).
"""
import os

import numpy as np
import pytest

dm_control = pytest.importorskip("dm_control")

from agents_tpu.environments import suite_dm_control
from agents_tpu.environments import utils as env_utils
from agents_tpu.environments.dm_env_wrapper import PyToDmWrapper
from agents_tpu.specs import array_spec
from agents_tpu.trajectories import time_step as ts


def test_load_and_validate_cartpole_swingup():
  env = suite_dm_control.load("cartpole", "swingup")
  # Spec conversion: float64 demoted, dict observation preserved.
  ospec = env.observation_spec()
  assert isinstance(ospec, dict) and set(ospec) == {"position", "velocity"}
  for s in ospec.values():
    assert s.dtype == np.float32
  aspec = env.action_spec()
  assert isinstance(aspec, array_spec.BoundedArraySpec)
  assert aspec.minimum == -1.0 and aspec.maximum == 1.0
  # Full spec-compliance drive (the reference validate_py_environment).
  env_utils.validate_py_environment(env, episodes=1)


def test_episode_protocol_and_rewards():
  env = suite_dm_control.load("cartpole", "balance")
  first = env.reset()
  assert int(first.step_type) == int(ts.StepType.FIRST)
  assert float(first.reward) == 0.0 and float(first.discount) == 1.0
  total = 0.0
  step = env.step(np.zeros((1,), np.float32))
  assert int(step.step_type) == int(ts.StepType.MID)
  for _ in range(20):
    step = env.step(np.ones((1,), np.float32) * 0.5)
    total += float(step.reward)
  assert total > 0.0  # balance task emits positive rewards
  assert step.observation["position"].dtype == np.float32


def test_round_trip_through_py_to_dm_wrapper():
  """agents_tpu env -> dm_env consumer, with the REAL dm_env package
  (previously only the duck-typed fallback was exercised)."""
  import dm_env

  from agents_tpu.environments.test_envs import CountingPyEnv
  wrapped = PyToDmWrapper(CountingPyEnv(steps_per_episode=3))
  first = wrapped.reset()
  assert isinstance(first, dm_env.TimeStep)
  assert first.first() and first.reward == 0.0 and first.discount == 1.0
  steps = [wrapped.step(0) for _ in range(3)]
  assert steps[-1].last()
  ospec = wrapped.observation_spec()
  import dm_env.specs as dm_specs
  assert isinstance(ospec, (dm_specs.Array, dm_specs.BoundedArray))


def test_load_pixels_renders_uint8_observations():
  """Pixel-observation variant (reference suite_dm_control.load_pixels):
  EGL headless rendering to a uint8 image dict. Runs in a subprocess —
  loading EGL into the suite's process corrupts later C-extension
  imports (observed: segfault importing TensorBoard's compiled deps)."""
  import subprocess
  import sys
  child = """
import os
os.environ["MUJOCO_GL"] = "egl"
import numpy as np
from agents_tpu.environments import suite_dm_control
env = suite_dm_control.load_pixels(
    "cartpole", "balance", render_kwargs={"width": 32, "height": 32})
first = env.reset()
px = first.observation["pixels"]
assert px.shape == (32, 32, 3) and px.dtype == np.uint8, (px.shape, px.dtype)
spec = env.observation_spec()["pixels"]
assert tuple(spec.shape) == (32, 32, 3) and spec.dtype == np.uint8
print("PIXELS_OK")
"""
  env_vars = dict(os.environ)
  env_vars.pop("PALLAS_AXON_POOL_IPS", None)
  env_vars["JAX_PLATFORMS"] = "cpu"
  out = subprocess.run(
      [sys.executable, "-c", child], capture_output=True, text=True,
      timeout=300, env=env_vars,
      cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
  assert "PIXELS_OK" in out.stdout, (out.stdout[-500:], out.stderr[-1500:])


def test_dm_control_trains_ddpg_smoke():
  """A few DDPG train steps on real dm_control transitions — the
  adapter's output feeds the agent stack end to end."""
  import jax
  import optax

  from agents_tpu import networks
  from agents_tpu.agents.ddpg import DdpgAgent
  from agents_tpu.drivers.py_driver import PyDriver
  from agents_tpu.environments.batched_py_environment import (
      BatchedPyEnvironment,)
  from agents_tpu.environments.wrappers import FlattenObservationsWrapper
  from agents_tpu.policies.jitted_py_policy import JittedPyPolicy
  from agents_tpu.replay_buffers.py_uniform_replay import (
      PyUniformReplayBuffer,)
  from agents_tpu.trajectories import trajectory as tj

  env = BatchedPyEnvironment([FlattenObservationsWrapper(
      suite_dm_control.load("cartpole", "balance")) for _ in range(2)])
  tss, asp = env.time_step_spec(), env.action_spec()
  agent = DdpgAgent(
      tss, asp,
      actor_network=networks.make_deterministic_actor_network(
          tss.observation, asp, fc_layer_params=(32,)),
      critic_network=networks.make_critic_network(
          tss.observation, asp, joint_fc_layer_params=(32,)),
      actor_optimizer=optax.adam(1e-3),
      critic_optimizer=optax.adam(1e-3))
  state = agent.init(jax.random.key(0))
  buf = PyUniformReplayBuffer(tj.trajectory_spec(tss, asp), 512,
                              writer_batch_size=2)
  pol = JittedPyPolicy(agent.collect_policy, seed=0)
  pol.update_params(agent.collect_policy_params(state))
  PyDriver(env, pol, observers=[buf.add_batch], max_steps=96).run(
      env.reset(), policy_state=pol.init_state(2))
  batch = buf.sample(32, num_steps=2, rng=np.random.RandomState(0))
  batch = jax.tree_util.tree_map(lambda x: jax.numpy.asarray(x), batch)
  state2, info = jax.jit(agent.train)(state, batch)
  assert np.isfinite(float(info.loss))
