"""Data-parallel scaling tests on the 8-device virtual CPU mesh
(mirrors the strategy-parameterized learner tests,
train/learner_test.py:46-69)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from agents_tpu import metrics, networks
from agents_tpu.agents.dqn import DqnAgent
from agents_tpu.environments.classic.cartpole import CartPole
from agents_tpu.environments.jax_environment import BatchedJaxEnv
from agents_tpu.parallel import create_mesh, shard_loop_state
from agents_tpu.replay_buffers import UniformReplay
from agents_tpu.train import FusedTrainLoop
from agents_tpu.trajectories import trajectory as tj
from agents_tpu.utils import common


def _loop(B):
  env = BatchedJaxEnv(CartPole(), batch_size=B)
  tss, asp = env.time_step_spec(), env.action_spec()
  qnet = networks.make_q_network(tss.observation, asp,
                                 fc_layer_params=(16,))
  agent = DqnAgent(tss, asp, qnet, optax.adam(1e-3), gamma=0.99,
                   td_errors_loss_fn=common.element_wise_squared_loss)
  replay = UniformReplay(tj.trajectory_spec(tss, asp), batch_size=B,
                         max_length=128)
  return FusedTrainLoop(env, agent, replay, sample_batch_size=32)


@pytest.mark.parametrize("n_devices", [1, 2, 8])
def test_dp_iteration_over_mesh(n_devices):
  assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
  B = max(8, n_devices)
  loop = _loop(B)
  mesh = create_mesh(n_devices)
  state = loop.init(jax.random.key(0), initial_collect_steps=4)
  state = shard_loop_state(state, mesh, B,
                           replay_capacity=loop.replay.capacity)
  new_state, loss_info = jax.jit(loop.iteration)(state)
  assert np.isfinite(float(loss_info.loss))
  # Params must remain replicated (identical) across devices.
  w = jax.tree_util.tree_leaves(new_state.agent_state.q_params)[0]
  assert w.sharding.is_fully_replicated


def test_dp_matches_single_device_numerics():
  """The sharded program must compute the same result as unsharded."""
  B = 8
  loop = _loop(B)
  state0 = loop.init(jax.random.key(0), initial_collect_steps=4)

  ref_state, ref_loss = jax.jit(loop.iteration)(state0)

  mesh = create_mesh(4)
  sharded = shard_loop_state(state0, mesh, B,
                             replay_capacity=loop.replay.capacity)
  dp_state, dp_loss = jax.jit(loop.iteration)(sharded)
  np.testing.assert_allclose(float(ref_loss.loss), float(dp_loss.loss),
                             rtol=1e-4)
  np.testing.assert_allclose(
      np.asarray(jax.tree_util.tree_leaves(ref_state.agent_state.q_params)[0]),
      np.asarray(jax.tree_util.tree_leaves(dp_state.agent_state.q_params)[0]),
      rtol=1e-4, atol=1e-6)


def test_bandit_psum_axis(monkeypatch):
  """LinearBanditAgent with axis_name aggregates sufficient stats across
  shards (the merge_call all-reduce analogue)."""
  from functools import partial

  from agents_tpu import specs
  from agents_tpu.bandits.agents import LinUcbAgent
  from agents_tpu.trajectories import time_step as ts

  obs_spec = specs.ArraySpec((2,), np.float32)
  tss = ts.time_step_spec(obs_spec)
  asp = specs.BoundedArraySpec((), np.int32, 0, 2)
  agent = LinUcbAgent(tss, asp, axis_name="data")
  agent_dp = agent
  state = agent.init(jax.random.key(0))

  B = 8
  traj = tj.Trajectory(
      step_type=jnp.zeros((B,), jnp.int32),
      observation=jax.random.normal(jax.random.key(1), (B, 2)),
      action=jnp.arange(B, dtype=jnp.int32) % 3,
      policy_info=(),
      next_step_type=jnp.full((B,), 2, jnp.int32),
      reward=jnp.ones((B,)),
      discount=jnp.ones((B,)))

  mesh = create_mesh(4)
  from jax.sharding import PartitionSpec as P
  from jax.experimental.shard_map import shard_map

  @partial(shard_map, mesh=mesh,
           in_specs=(P(), jax.tree_util.tree_map(lambda _: P("data"), traj)),
           out_specs=P(), check_rep=False)
  def dp_train(st, tr):
    new_state, _ = agent_dp.train(st, tr)
    return new_state

  dp_state = dp_train(state, traj)

  # Compare against single-shard (no axis) training on the full batch.
  agent_single = LinUcbAgent(tss, asp)
  ref_state, _ = jax.jit(agent_single.train)(state, traj)
  np.testing.assert_allclose(np.asarray(dp_state.a_mat),
                             np.asarray(ref_state.a_mat), rtol=1e-5)
  np.testing.assert_allclose(np.asarray(dp_state.b_vec),
                             np.asarray(ref_state.b_vec), rtol=1e-5)


def test_sample_sharded_matches_uniform_semantics():
  """Shard-local sampling: payload integrity, full row coverage, and
  uniform inclusion probabilities (stratified by shard)."""
  from jax.sharding import NamedSharding, PartitionSpec as P

  from agents_tpu import specs
  from agents_tpu.trajectories import time_step as ts

  B, CAP, S = 8, 16, 512
  spec = {"obs": specs.ArraySpec((3,), np.float32),
          "tag": specs.ArraySpec((), np.int32)}
  rb = UniformReplay(spec, batch_size=B, max_length=CAP)
  state = rb.init()
  for t in range(10):
    item = {"obs": jnp.stack([jnp.full((3,), 100 * r + t, jnp.float32)
                              for r in range(B)]),
            "tag": jnp.arange(B, dtype=jnp.int32) * 100 + t}
    state = rb.add_batch(state, item)

  mesh = create_mesh(4)
  storage = jax.tree_util.tree_map(
      lambda x: jax.device_put(x, NamedSharding(mesh, P(None, "data"))),
      state.storage)
  state = state.replace(storage=storage)

  batch, info = jax.jit(
      lambda s, k: rb.sample_sharded(s, k, S, mesh))(state, jax.random.key(3))
  rows, ids = np.asarray(info.rows), np.asarray(info.ids)
  tags = np.asarray(batch["tag"])
  obs = np.asarray(batch["obs"])

  # Payload == (row, time) identity for every sample.
  np.testing.assert_array_equal(tags, rows * 100 + ids)
  np.testing.assert_array_equal(obs[:, 0], (rows * 100 + ids).astype(np.float32))
  # Stratified: exactly S/4 samples from each shard's row block.
  for shard in range(4):
    in_shard = (rows // 2) == shard
    assert in_shard.sum() == S // 4
  # All rows and all valid time ids appear (coverage).
  assert set(rows) == set(range(B))
  assert set(ids) == set(range(10))
  # Inclusion probability 1/(valid*B), like plain `sample`.
  np.testing.assert_allclose(np.asarray(info.probabilities),
                             1.0 / (10 * B), rtol=1e-6)
