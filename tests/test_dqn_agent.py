"""DQN agent tests with hand-set networks and exact loss values
(mirrors agents/dqn/dqn_agent_test.py's DummyNet golden-value style)."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from agents_tpu import specs
from agents_tpu.agents.dqn import DdqnAgent, DqnAgent
from agents_tpu.networks.network import Network
from agents_tpu.trajectories import time_step as ts
from agents_tpu.trajectories import trajectory as tj
from agents_tpu.utils import common


class DummyNet(nn.Module):
  """Q(obs) = obs @ W + b with fixed init: W = [[2, 1], [1, 1]], b = [1, 1]
  (same constants as reference dqn_agent_test.py DummyNet)."""

  @nn.compact
  def __call__(self, observation, step_type=None, network_state=()):
    w = self.param("w", lambda k, s: jnp.array([[2.0, 1.0], [1.0, 1.0]]),
                   (2, 2))
    b = self.param("b", lambda k, s: jnp.array([1.0, 1.0]), (2,))
    obs = jax.tree_util.tree_leaves(observation)[0].astype(jnp.float32)
    return obs @ w + b, network_state


def _specs():
  obs_spec = specs.ArraySpec((2,), np.float32)
  tss = ts.time_step_spec(obs_spec)
  asp = specs.BoundedArraySpec((), np.int32, 0, 1)
  return tss, asp


def _make_agent(cls=DqnAgent, **kwargs):
  tss, asp = _specs()
  net = Network(DummyNet(), tss.observation)
  kwargs.setdefault("td_errors_loss_fn", common.element_wise_squared_loss)
  return cls(tss, asp, net, optax.sgd(0.01), gamma=1.0, **kwargs)


def _experience():
  """Two-frame trajectories, batch of 2 (matches reference test data):
  obs [[1,2],[3,4]] -> [[5,6],[7,8]], actions [0,1], rewards [10,20]."""
  obs = jnp.array([[[1., 2.], [5., 6.]], [[3., 4.], [7., 8.]]])
  return tj.Trajectory(
      step_type=jnp.array([[0, 1], [0, 1]], jnp.int32),
      observation=obs,
      action=jnp.array([[0, 0], [1, 1]], jnp.int32),
      policy_info=(),
      next_step_type=jnp.array([[1, 1], [1, 1]], jnp.int32),
      reward=jnp.array([[10., 10.], [20., 20.]]),
      discount=jnp.array([[0.9, 0.9], [0.9, 0.9]]),
  )


def test_loss_golden_value():
  """Reference dqn_agent_test.py testLoss golden: 26.0.

  q(s0, a) = [5+1, 8+1][a0=0] = 5, ... with W/b above:
    q0 = [obs0 @ W + b] indexed by action = [5, 12]  (row0: [1,2]->[5,4]?)
  Recompute: obs [1,2]: q = [1*2+2*1+1, 1*1+2*1+1] = [5, 4]; action 0 -> 5
             obs [3,4]: q = [3*2+4+1, 3+4+1] = [11, 8]; action 1 -> 8
  next obs [5,6]: q = [17, 12] -> max 17; [7,8]: q = [23, 16] -> max 23
  targets: 10 + 0.9*17 = 25.3 ; 20 + 0.9*23 = 40.7
  td errors: 20.3, 32.7 ; squared mean = (412.09 + 1069.29)/2 = 740.69
  """
  agent = _make_agent()
  state = agent.init(jax.random.key(0))
  _, info = jax.jit(agent.train)(state, _experience())
  np.testing.assert_allclose(float(info.loss), 740.69, rtol=1e-5)


def test_train_updates_and_target_lags():
  agent = _make_agent(target_update_period=2, target_update_tau=1.0)
  state = agent.init(jax.random.key(0))
  train = jax.jit(agent.train)
  s1, _ = train(state, _experience())
  # params moved
  assert not np.allclose(np.asarray(s1.q_params["params"]["w"]),
                         np.asarray(state.q_params["params"]["w"]))
  # target not yet updated at step 1 (period 2)
  np.testing.assert_array_equal(
      np.asarray(s1.target_q_params["params"]["w"]),
      np.asarray(state.target_q_params["params"]["w"]))
  s2, _ = train(s1, _experience())
  # step 2: hard update -> target == online
  np.testing.assert_array_equal(
      np.asarray(s2.target_q_params["params"]["w"]),
      np.asarray(s2.q_params["params"]["w"]))


def test_ddqn_uses_online_argmax():
  agent = _make_agent(DdqnAgent)
  state = agent.init(jax.random.key(0))
  _, info = jax.jit(agent.train)(state, _experience())
  # With identical online/target nets at init, DDQN == DQN loss here.
  np.testing.assert_allclose(float(info.loss), 740.69, rtol=1e-5)


def test_boundary_transitions_masked():
  agent = _make_agent()
  state = agent.init(jax.random.key(0))
  exp = _experience()
  # Make first batch element a boundary (LAST -> FIRST): loss contribution 0.
  exp = exp.replace(
      step_type=jnp.array([[2, 0], [0, 1]], jnp.int32),
      next_step_type=jnp.array([[0, 1], [1, 1]], jnp.int32))
  _, info = jax.jit(agent.train)(state, exp)
  np.testing.assert_allclose(float(info.loss), 1069.29 / 2, rtol=1e-5)
  np.testing.assert_allclose(np.asarray(info.extra.td_error)[0], 0.0)


def test_policies_act_within_spec():
  agent = _make_agent()
  state = agent.init(jax.random.key(0))
  obs = jnp.array([[1., 2.]])
  step = ts.restart(obs, batch_size=1)
  greedy = agent.policy.action(agent.policy_params(state), step, (),
                               jax.random.key(0))
  assert int(greedy.action[0]) in (0, 1)
  # obs [1,2] -> q=[5,4] -> greedy action 0
  assert int(greedy.action[0]) == 0
  collect = agent.collect_policy.action(agent.collect_policy_params(state),
                                        step, (), jax.random.key(0))
  assert int(collect.action[0]) in (0, 1)


def test_scheduled_epsilon_decay():
  """Callable epsilon sees the train step (mnih15 polynomial decay)."""
  tss, act = _specs()
  eps_fn = lambda step: 1.0 + jnp.minimum(
      step.astype(jnp.float32) / 100.0, 1.0) * (0.1 - 1.0)
  agent = DqnAgent(tss, act, Network(DummyNet(), tss.observation),
                   optax.adam(1e-3), epsilon_greedy=eps_fn)
  state = agent.init(jax.random.key(0))
  params = agent.collect_policy_params(state)
  assert set(params.keys()) == {"q", "train_step"}
  np.testing.assert_allclose(
      float(agent.collect_policy._epsilon(params)), 1.0)
  late = agent.collect_policy_params(
      state.replace(train_step=jnp.asarray(1000, jnp.int32)))
  np.testing.assert_allclose(
      float(agent.collect_policy._epsilon(late)), 0.1, rtol=1e-6)
  # Acting works under jit with the dict params.
  step = ts.restart(jnp.array([[1.0, 2.0]]), batch_size=1)
  out = jax.jit(agent.collect_policy.action)(params, step, (),
                                             jax.random.key(1))
  assert int(out.action[0]) in (0, 1)
  # Greedy eval policy still takes bare q_params.
  g = agent.policy.action(agent.policy_params(state), step)
  assert int(g.action[0]) == 0
