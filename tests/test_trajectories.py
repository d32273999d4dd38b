"""TimeStep/Trajectory algebra tests (mirrors trajectories/*_test.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from agents_tpu import specs
from agents_tpu.trajectories import policy_step as ps
from agents_tpu.trajectories import time_step as ts
from agents_tpu.trajectories import trajectory as tj


def test_restart_transition_termination():
  obs = jnp.zeros((2, 3))
  first = ts.restart(obs, batch_size=2)
  assert np.all(np.asarray(first.step_type) == ts.StepType.FIRST)
  assert first.discount.shape == (2,)
  mid = ts.transition(obs, reward=jnp.ones((2,)))
  assert np.all(np.asarray(mid.step_type) == ts.StepType.MID)
  assert np.all(np.asarray(mid.discount) == 1.0)
  last = ts.termination(obs, reward=jnp.ones((2,)))
  assert np.all(np.asarray(last.discount) == 0.0)
  trunc = ts.truncation(obs, reward=jnp.ones((2,)), discount=0.9)
  assert np.allclose(np.asarray(trunc.discount), 0.9)
  assert np.all(np.asarray(trunc.step_type) == ts.StepType.LAST)


def test_time_step_is_pytree():
  step = ts.restart(jnp.zeros((4,)), batch_size=None)
  leaves = jax.tree_util.tree_leaves(step)
  assert len(leaves) == 4
  doubled = jax.tree_util.tree_map(lambda x: x * 2, step)
  assert isinstance(doubled, ts.TimeStep)


def test_time_step_spec():
  spec = ts.time_step_spec(specs.ArraySpec((3,), np.float32))
  assert spec.observation.shape == (3,)
  assert spec.step_type.dtype == np.int32
  assert spec.discount.minimum == 0.0


def test_from_transition_roundtrip():
  obs = jnp.arange(6, dtype=jnp.float32).reshape(2, 3)
  t0 = ts.restart(obs, batch_size=2)
  action = jnp.array([0, 1], jnp.int32)
  astep = ps.PolicyStep(action=action)
  t1 = ts.transition(obs + 1, reward=jnp.array([1.0, 2.0]))
  traj = tj.from_transition(t0, astep, t1)
  assert np.all(np.asarray(traj.step_type) == ts.StepType.FIRST)
  assert np.all(np.asarray(traj.next_step_type) == ts.StepType.MID)
  assert np.allclose(np.asarray(traj.reward), [1.0, 2.0])


def test_to_transition_slicing():
  # [B=1, T=3] trajectory -> T-1=2 transitions.
  B, T = 1, 3
  traj = tj.Trajectory(
      step_type=jnp.array([[0, 1, 1]], jnp.int32),
      observation=jnp.arange(3, dtype=jnp.float32)[None, :, None],
      action=jnp.array([[5, 6, 7]], jnp.int32),
      policy_info=(),
      next_step_type=jnp.array([[1, 1, 2]], jnp.int32),
      reward=jnp.array([[10., 20., 30.]]),
      discount=jnp.ones((B, T)),
  )
  trans = tj.to_transition(traj)
  assert trans.time_step.observation.shape == (1, 2, 1)
  assert np.allclose(np.asarray(trans.next_time_step.reward), [[10., 20.]])
  assert np.allclose(np.asarray(trans.next_time_step.observation[0, :, 0]),
                     [1., 2.])
  assert np.all(np.asarray(trans.time_step.reward) == 0)


def test_to_n_step_transition():
  # B=1, T=4 (N=3), constant reward 1, discount 1, gamma=0.5.
  B, T = 1, 4
  traj = tj.Trajectory(
      step_type=jnp.zeros((B, T), jnp.int32),
      observation=jnp.arange(T, dtype=jnp.float32)[None, :],
      action=jnp.zeros((B, T), jnp.int32),
      policy_info=(),
      next_step_type=jnp.ones((B, T), jnp.int32),
      reward=jnp.ones((B, T)),
      discount=jnp.ones((B, T)),
  )
  trans = tj.to_n_step_transition(traj, gamma=0.5)
  # reward = 1 + 0.5 + 0.25 = 1.75 ; discount = 0.5^2 = 0.25
  assert np.allclose(np.asarray(trans.next_time_step.reward), [1.75])
  assert np.allclose(np.asarray(trans.next_time_step.discount), [0.25])
  assert np.allclose(np.asarray(trans.time_step.observation), [0.])
  assert np.allclose(np.asarray(trans.next_time_step.observation), [3.])


def test_from_episode():
  traj = tj.from_episode(
      observation=jnp.zeros((5, 2)),
      action=jnp.zeros((5,), jnp.int32),
      policy_info=(),
      reward=jnp.ones((5,)),
  )
  st = np.asarray(traj.step_type)
  nst = np.asarray(traj.next_step_type)
  assert st[0] == ts.StepType.FIRST and np.all(st[1:] == ts.StepType.MID)
  assert nst[-1] == ts.StepType.LAST and np.all(nst[:-1] == ts.StepType.MID)


def test_boundary_factories():
  traj = tj.boundary(jnp.zeros((2,)), jnp.zeros((2,), jnp.int32), (),
                     jnp.zeros((2,)), jnp.ones((2,)))
  assert np.all(np.asarray(traj.is_boundary()))
  single = tj.single_step(jnp.zeros((2,)), jnp.zeros((2,), jnp.int32), (),
                          jnp.zeros((2,)), jnp.ones((2,)))
  assert np.all(np.asarray(single.is_last()))
  assert np.all(np.asarray(single.step_type) == ts.StepType.FIRST)
