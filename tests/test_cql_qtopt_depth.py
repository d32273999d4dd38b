"""Depth tests for CQL-SAC and QtOpt: every reference constructor option
has a behavioral test, with hand-derived golden values where the math is
closed-form (constant-Q / fixed-distribution fakes).

Reference semantics:
  - tf_agents/agents/cql/cql_sac_agent.py:540-680  (_cql_loss)
  - tf_agents/agents/cql/cql_sac_agent.py:767      (optional entropy term)
  - tf_agents/agents/cql/cql_sac_agent.py:682-735  (BC actor warm-start)
  - tf_agents/agents/cql/cql_sac_agent.py:328-350  (CQL-Lagrange)
  - tf_agents/agents/qtopt/qtopt_agent.py:712-760  (clipped double-Q)
"""
import types as pytypes

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from agents_tpu import networks, specs
from agents_tpu.agents.cql import CqlSacAgent
from agents_tpu.agents.qtopt import QtOptAgent
from agents_tpu.trajectories import time_step as ts
from agents_tpu.trajectories import trajectory as tj

OBS = specs.ArraySpec((3,), np.float32)
TSS = ts.time_step_spec(OBS)
CONT_ACT = specs.BoundedArraySpec((1,), np.float32, -1.0, 1.0)
CONT_ACT2 = specs.BoundedArraySpec((2,), np.float32, -1.0, 1.0)

B = 4


def _traj(action_spec=CONT_ACT2, T=2, reward=1.0):
  key = jax.random.key(0)
  action = jnp.clip(jax.random.normal(key, (B, T) + action_spec.shape),
                    -1, 1)
  return tj.Trajectory(
      step_type=jnp.zeros((B, T), jnp.int32),
      observation=jax.random.normal(key, (B, T, 3)),
      action=action, policy_info=(),
      next_step_type=jnp.ones((B, T), jnp.int32),
      reward=jnp.full((B, T), reward), discount=jnp.ones((B, T)))


def _mid_time_steps():
  return ts.TimeStep(
      step_type=jnp.full((B,), ts.StepType.MID, jnp.int32),
      reward=jnp.ones((B,)), discount=jnp.ones((B,)),
      observation=jnp.zeros((B, 3)))


# ---- fakes with closed-form values ------------------------------------------

class ConstQNet:
  """Critic stub: Q(s, a) = c for every (s, a)."""

  def __init__(self, c):
    self.c = float(c)

  def init_params(self, key):
    return {"w": jnp.zeros(())}

  def apply(self, params, inputs, step_type, state):
    _, act = inputs
    batch = jnp.shape(jax.tree_util.tree_leaves(act)[0])[0]
    return jnp.full((batch,), self.c) + 0.0 * params["w"], state


class FixedDist:
  """Distribution stub: samples zeros with constant log-probs."""

  def __init__(self, batch, shape, log_pi, log_prob_data):
    self.batch, self.shape = batch, shape
    self.log_pi, self.log_prob_data = log_pi, log_prob_data

  def sample_and_log_prob(self, key):
    return (jnp.zeros((self.batch,) + self.shape),
            jnp.full((self.batch,), self.log_pi))

  def log_prob(self, a):
    return jnp.full((a.shape[0],), self.log_prob_data)


class FixedActorNet:
  state_spec = ()

  def __init__(self, shape, log_pi=0.0, log_prob_data=0.0):
    self.shape = shape
    self.log_pi, self.log_prob_data = log_pi, log_prob_data

  def init_params(self, key):
    return {}

  def apply(self, params, obs, step_type, state):
    batch = jnp.shape(jax.tree_util.tree_leaves(obs)[0])[0]
    return FixedDist(batch, self.shape, self.log_pi,
                     self.log_prob_data), state


def _fake_agent(act_spec=CONT_ACT, q_const=0.5, log_pi=0.0,
                log_prob_data=0.0, **kw):
  return CqlSacAgent(
      TSS, act_spec,
      critic_network=ConstQNet(q_const),
      actor_network=FixedActorNet(act_spec.shape, log_pi, log_prob_data),
      actor_optimizer=optax.sgd(0.0), critic_optimizer=optax.sgd(0.0),
      alpha_optimizer=optax.sgd(0.0), **kw)


def _real_agent(**kw):
  return CqlSacAgent(
      TSS, CONT_ACT2,
      critic_network=networks.make_critic_network(
          OBS, CONT_ACT2, joint_fc_layer_params=(16,)),
      actor_network=networks.make_sac_actor_network(
          OBS, CONT_ACT2, fc_layer_params=(16,)),
      actor_optimizer=optax.adam(3e-4), critic_optimizer=optax.adam(3e-4),
      alpha_optimizer=optax.adam(3e-4), gamma=0.99, **kw)


# ---- CQL loss golden ---------------------------------------------------------

def test_cql_loss_golden_constant_q():
  """With Q == c everywhere, a deterministic policy (log_pi=0) and action
  dim d bounded [-1,1] (log_u = -d*log 2):

    combined = [c*temp - 0] * n  ++  [c*temp + d*log2] * n
    lse      = (c*temp + log(n * (1 + 2^d))) / temp
    cql_loss = lse - c = log(n * (1 + 2^d)) / temp

  independent of every random draw (cql_sac_agent.py:640-662 math).
  """
  for d, spec in [(1, CONT_ACT), (2, CONT_ACT2)]:
    for temp in (1.0, 2.0):
      n = 4
      agent = _fake_agent(act_spec=spec, q_const=0.7, num_cql_samples=n,
                          softmax_temperature=temp, cql_alpha=1.0,
                          include_critic_entropy_term=False)
      state = agent.init(jax.random.key(0))
      tsteps = _mid_time_steps()
      actions = jnp.zeros((B,) + spec.shape)
      got = float(agent._cql_loss(
          (state.critic1_params, state.critic2_params), state, tsteps,
          actions, jax.random.key(1)))
      want = np.log(n * (1.0 + 2.0 ** d)) / temp
      np.testing.assert_allclose(got, want, rtol=1e-5)


def test_critic_entropy_term_golden():
  """Constant-Q fake: with include_critic_entropy_term the TD target
  shifts by -gamma * alpha * log_pi, so per-example loss is
  2*(r + g*(c - a*L) - c)^2 vs 2*(r + g*c - c)^2 without."""
  c, L, g, r = 0.5, -1.3, 0.9, 1.0
  kw = dict(q_const=c, log_pi=L, gamma=g, num_cql_samples=2,
            initial_log_alpha=0.0)
  tsteps, nsteps = _mid_time_steps(), _mid_time_steps()
  actions = jnp.zeros((B, 1))

  def loss_with(include):
    agent = _fake_agent(include_critic_entropy_term=include, **kw)
    state = agent.init(jax.random.key(0))
    cp = (state.critic1_params, state.critic2_params)
    return float(agent.critic_loss(cp, state, tsteps, actions, nsteps,
                                   jax.random.key(2)))

  alpha = 1.0  # exp(initial_log_alpha=0)
  want_without = 2 * (r + g * c - c) ** 2
  want_with = 2 * (r + g * (c - alpha * L) - c) ** 2
  np.testing.assert_allclose(loss_with(False), want_without, rtol=1e-5)
  np.testing.assert_allclose(loss_with(True), want_with, rtol=1e-5)


def test_bc_actor_warm_start_golden():
  """Constant-Q fake: during the BC phase the actor loss is
  mean(alpha*log_pi - log_prob(data)) instead of mean(alpha*log_pi - Q)
  (cql_sac_agent.py:705-720)."""
  c, Lpi, Ld = 0.5, -0.2, -2.0
  agent = _fake_agent(q_const=c, log_pi=Lpi, log_prob_data=Ld,
                      num_bc_steps=3, num_cql_samples=2,
                      initial_log_alpha=0.0)
  state = agent.init(jax.random.key(0))
  tsteps = _mid_time_steps()
  data_actions = jnp.zeros((B, 1))

  def actor_loss_at(step):
    st = state.replace(train_step=jnp.asarray(step, jnp.int32))
    _, (actor_loss, _) = agent.actor_and_alpha_loss(
        st.actor_params, st.log_alpha, st, tsteps, jax.random.key(3),
        data_actions=data_actions)
    return float(actor_loss)

  alpha = 1.0
  np.testing.assert_allclose(actor_loss_at(0), alpha * Lpi - Ld, rtol=1e-5)
  np.testing.assert_allclose(actor_loss_at(2), alpha * Lpi - Ld, rtol=1e-5)
  np.testing.assert_allclose(actor_loss_at(3), alpha * Lpi - c, rtol=1e-5)


def test_reward_noise_changes_targets_only_when_enabled():
  c = 0.5
  tsteps, nsteps = _mid_time_steps(), _mid_time_steps()
  actions = jnp.zeros((B, 1))

  def loss_with(var):
    agent = _fake_agent(q_const=c, reward_noise_variance=var,
                        num_cql_samples=2)
    state = agent.init(jax.random.key(0))
    cp = (state.critic1_params, state.critic2_params)
    return float(agent.critic_loss(cp, state, tsteps, actions, nsteps,
                                   jax.random.key(4)))

  assert loss_with(0.0) == loss_with(0.0)
  assert loss_with(1.0) != loss_with(0.0)
  with pytest.raises(ValueError):
    _fake_agent(reward_noise_variance=-1.0)


def test_lagrange_cql_alpha_moves_toward_tau():
  """CQL-Lagrange: alpha decreases when cql_loss < tau and increases when
  cql_loss > tau (reference eq. 24 comment, cql_sac_agent.py:328-335).
  The constant-Q fake pins cql_loss = log(2n) exactly."""
  n = 2
  cql_loss = float(np.log(n * (1 + 2)))  # d=1 -> log(n*3)

  def run(tau):
    agent = _fake_agent(q_const=0.5, num_cql_samples=n,
                        use_lagrange_cql_alpha=True, cql_tau=tau,
                        cql_alpha=1.0, cql_alpha_learning_rate=1e-2)
    state = agent.init(jax.random.key(0))
    new_state, info = jax.jit(agent.train)(state, _traj(CONT_ACT))
    return (float(state.log_cql_alpha), float(new_state.log_cql_alpha),
            float(info.extra.cql_loss), float(info.extra.cql_alpha_loss))

  lo0, lo1, got_cql, a_loss = run(tau=cql_loss + 5.0)   # gap < 0
  np.testing.assert_allclose(got_cql, cql_loss, rtol=1e-5)
  assert lo1 < lo0, "alpha should decrease when cql_loss < tau"
  np.testing.assert_allclose(a_loss, -np.exp(lo0) * (cql_loss - (cql_loss + 5.0)),
                             rtol=1e-5)

  hi0, hi1, _, _ = run(tau=cql_loss - 5.0)              # gap > 0
  assert hi1 > hi0, "alpha should increase when cql_loss > tau"


def test_lagrange_log_alpha_clipping():
  agent = _fake_agent(q_const=0.5, num_cql_samples=2,
                      use_lagrange_cql_alpha=True, cql_alpha=100.0,
                      log_cql_alpha_clipping=(-1.0, 1.0))
  state = agent.init(jax.random.key(0))
  # log(100) > 1 -> clipped to exp(1).
  np.testing.assert_allclose(float(agent._get_cql_alpha(state)), np.e,
                             rtol=1e-6)


def test_bc_debug_mode_trains_critic_on_cql_only():
  """bc_debug_mode: the critic total is cql_alpha * cql_loss alone
  (reference :290). With the constant-Q fake the value is exact."""
  n, a = 2, 3.0
  agent = _fake_agent(q_const=0.5, num_cql_samples=n, cql_alpha=a,
                      bc_debug_mode=True)
  state = agent.init(jax.random.key(0))
  _, info = jax.jit(agent.train)(state, _traj(CONT_ACT))
  np.testing.assert_allclose(float(info.extra.critic_loss),
                             a * np.log(n * 3), rtol=1e-5)


def test_cql_full_train_all_options_real_networks():
  """End-to-end: every option on at once with real nets stays finite and
  updates all parameter groups including log_cql_alpha."""
  agent = _real_agent(cql_alpha=2.0, num_cql_samples=3,
                      include_critic_entropy_term=True,
                      use_lagrange_cql_alpha=True, cql_tau=1.0,
                      reward_noise_variance=0.1, num_bc_steps=1,
                      softmax_temperature=0.5,
                      log_cql_alpha_clipping=(-5.0, 5.0))
  state = agent.init(jax.random.key(0))
  s1, i1 = jax.jit(agent.train)(state, _traj())
  s2, i2 = jax.jit(agent.train)(s1, _traj())
  for info in (i1, i2):
    for leaf in jax.tree_util.tree_leaves(info):
      assert np.all(np.isfinite(np.asarray(leaf)))
  assert float(s2.log_cql_alpha) != float(state.log_cql_alpha)
  assert int(s2.train_step) == 2


# ---- QtOpt depth -------------------------------------------------------------

def _qtopt_agent(**kw):
  qnet = networks.make_critic_network(OBS, CONT_ACT2,
                                      joint_fc_layer_params=(16,))
  return QtOptAgent(TSS, CONT_ACT2, qnet, optax.adam(1e-3), **kw)


def test_qtopt_td3_state_and_update_chain():
  agent = _qtopt_agent(enable_td3=True, delayed_target_update_period=2,
                       target_update_period=1, target_update_tau=1.0)
  state = agent.init(jax.random.key(0))
  assert state.target_q_params_delayed is not None
  leaf = lambda p: np.asarray(jax.tree_util.tree_leaves(p)[0])

  # step 1: period-2 delayed nets don't update; target does (tau=1).
  s1, _ = jax.jit(agent.train)(state, _traj())
  np.testing.assert_array_equal(leaf(s1.target_q_params_delayed),
                                leaf(state.target_q_params_delayed))
  np.testing.assert_array_equal(leaf(s1.target_q_params),
                                leaf(s1.q_params))
  # step 2: delayed <- OLD target (pre-update s1.target), delayed_2 <- OLD
  # delayed (the init params), matching _update_both's sequential order.
  s2, _ = jax.jit(agent.train)(s1, _traj())
  np.testing.assert_array_equal(leaf(s2.target_q_params_delayed),
                                leaf(s1.target_q_params))
  np.testing.assert_array_equal(leaf(s2.target_q_params_delayed_2),
                                leaf(s1.target_q_params_delayed))


def test_qtopt_td3_disabled_matches_round1_shape():
  agent = _qtopt_agent(enable_td3=False)
  state = agent.init(jax.random.key(0))
  assert state.target_q_params_delayed is None
  _, info = jax.jit(agent.train)(state, _traj())
  assert np.isfinite(float(info.loss))
  assert info.extra.td_error.shape == (B,)


def test_qtopt_clipped_double_q_lowers_targets():
  """min(Q_d, Q_d2) <= Q_target pointwise, so with identical nets at init
  the TD targets agree; after the delayed nets diverge the td3 target is
  never larger."""
  agent = _qtopt_agent(enable_td3=True)
  state = agent.init(jax.random.key(0))
  nsteps = ts.TimeStep(
      step_type=jnp.ones((B,), jnp.int32), reward=jnp.zeros((B,)),
      discount=jnp.ones((B,)), observation=jnp.zeros((B, 3)))
  q_td3 = agent._compute_next_q_values(state, nsteps, (), jax.random.key(5))
  _, q_plain = agent.policy.optimize(state.target_q_params, nsteps,
                                     jax.random.key(5))
  # Same CEM action (same key/params); delayed nets == target at init, so
  # the clipped target must equal the plain one exactly.
  np.testing.assert_allclose(np.asarray(q_td3), np.asarray(q_plain),
                             rtol=1e-6)


def test_qtopt_epsilon_greedy_default_collect():
  from agents_tpu.policies.wrappers import (EpsilonGreedyPolicy,
                                            GaussianPolicy)
  assert isinstance(_qtopt_agent().collect_policy, EpsilonGreedyPolicy)
  assert isinstance(
      _qtopt_agent(exploration_noise_std=0.2).collect_policy,
      GaussianPolicy)


def test_qtopt_n_step_update():
  agent = _qtopt_agent(n_step_update=3, gamma=0.9)
  assert agent.train_sequence_length == 4
  state = agent.init(jax.random.key(0))
  _, info = jax.jit(agent.train)(state, _traj(T=4))
  assert np.isfinite(float(info.loss))


def test_qtopt_out_of_graph_bellman():
  """in_graph_bellman_update=False reads target_q from policy_info
  (reference :148-176). With target_q == 0 the TD target is the reward."""
  agent = _qtopt_agent(in_graph_bellman_update=False, gamma=1.0,
                       enable_td3=False)
  traj = _traj()
  traj = traj.replace(policy_info={
      "target_q": jnp.zeros((B, 2))})
  state = agent.init(jax.random.key(0))
  _, info = jax.jit(agent.train)(state, traj)
  assert np.isfinite(float(info.loss))


def test_qtopt_default_collect_policy_acts():
  """The default (epsilon-greedy over CEM) collect policy must actually
  produce actions — CEMPolicy has no closed-form _distribution, so the
  wrapper falls back to its _action as the greedy arm (the round-4
  review found every default-configured collection step crashed)."""
  agent = _qtopt_agent()
  state = agent.init(jax.random.key(0))
  B = 4
  tstep = ts.TimeStep(step_type=jnp.zeros((B,), jnp.int32),
                      reward=jnp.zeros((B,)), discount=jnp.ones((B,)),
                      observation=jnp.zeros((B, 3)))
  step = jax.jit(agent.collect_policy.action)(
      agent.collect_policy_params(state), tstep, (), jax.random.key(1))
  act = np.asarray(jax.tree_util.tree_leaves(step.action)[0])
  assert act.shape[0] == B and np.all(np.isfinite(act))
