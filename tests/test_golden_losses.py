"""Exact-loss golden tests for DDPG / TD3 / SAC / C51.

Mirrors the reference's agent test strategy (SURVEY.md §4: DummyNets with
hand-set kernels, exact loss assertions — e.g. ddpg_agent_test.py,
td3_agent_test.py, sac_agent_test.py, categorical_dqn_agent_test.py).
All networks here are linear with fixed constants, and every expected
value is derived independently in the comments/numpy below.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from agents_tpu import specs
from agents_tpu.distributions.distributions import Deterministic
from agents_tpu.networks.network import Network
from agents_tpu.trajectories import time_step as ts
from agents_tpu.trajectories import trajectory as tj

OBS = specs.ArraySpec((2,), np.float32)
TSS = ts.time_step_spec(OBS)
ACT = specs.BoundedArraySpec((1,), np.float32, -100.0, 100.0)


class LinearActor(nn.Module):
  """a = obs @ [[0.5], [-0.5]] (raw actions, no squash)."""

  @nn.compact
  def __call__(self, observation, step_type=None, network_state=()):
    w = self.param("w", lambda k, s: jnp.array([[0.5], [-0.5]]), (2, 1))
    return observation.astype(jnp.float32) @ w, network_state


class DeterministicDistActor(nn.Module):
  """Same map, emitting a Deterministic distribution so SAC's
  sample_and_log_prob is exact: sample = loc, log_pi = 0."""

  @nn.compact
  def __call__(self, observation, step_type=None, network_state=()):
    w = self.param("w", lambda k, s: jnp.array([[0.5], [-0.5]]), (2, 1))
    loc = observation.astype(jnp.float32) @ w
    return Deterministic(loc=loc, event_ndims=1), network_state


class LinearCritic(nn.Module):
  """q = sum(obs) + scale * sum(action)."""
  scale: float = 2.0

  @nn.compact
  def __call__(self, obs_and_action, step_type=None, network_state=()):
    obs, action = obs_and_action
    s = self.param("s", lambda k, sh: jnp.asarray(self.scale), ())
    q = jnp.sum(obs.astype(jnp.float32), -1) + s * jnp.sum(
        action.astype(jnp.float32), -1)
    return q, network_state


def _experience():
  """Batch 2 of 2-frame trajectories:
  obs  [[1,2] -> [5,6]], [[3,4] -> [7,8]]
  acts [[1], [-1]] (frame 0); trajectory reward[t] follows action[t], so
  the transition rewards are reward[:, 0] = [10, 20], discount 0.9.
  """
  obs = jnp.array([[[1., 2.], [5., 6.]], [[3., 4.], [7., 8.]]])
  return tj.Trajectory(
      step_type=jnp.array([[0, 1], [0, 1]], jnp.int32),
      observation=obs,
      action=jnp.array([[[1.], [1.]], [[-1.], [-1.]]]),
      policy_info=(),
      next_step_type=jnp.array([[1, 1], [1, 1]], jnp.int32),
      reward=jnp.array([[10., 10.], [20., 20.]]),
      discount=jnp.array([[0.9, 0.9], [0.9, 0.9]]),
  )


# Hand math shared by DDPG/TD3/SAC below (gamma = 1):
#   actor(next_obs): [5,6] -> 0.5*5-0.5*6 = -0.5 ; [7,8] -> -0.5
#   critic(next_obs, a*) with scale s: [11 + s*(-0.5), 15 + s*(-0.5)]
#   q(obs0, action0) = [3 + s*1, 7 + s*(-1)]


def test_ddpg_golden_losses():
  from agents_tpu.agents.ddpg import DdpgAgent
  agent = DdpgAgent(
      TSS, ACT,
      actor_network=Network(LinearActor(), TSS.observation),
      critic_network=Network(LinearCritic(2.0),
                             (TSS.observation, ACT)),
      actor_optimizer=optax.sgd(0.0), critic_optimizer=optax.sgd(0.0),
      gamma=1.0)
  state = agent.init(jax.random.key(0))
  _, info = jax.jit(agent.train)(state, _experience())
  # critic: target_q = [11-1, 15-1] = [10, 14]
  #         td_target = [10 + .9*10, 20 + .9*14] = [19, 32.6]
  #         q = [3+2, 7-2] = [5, 5]; errors [14, 27.6]
  #         loss = (14^2 + 27.6^2)/2 = (196 + 761.76)/2 = 478.88
  np.testing.assert_allclose(float(info.extra.critic_loss), 478.88,
                             rtol=1e-5)
  # actor: a = [-0.5, -0.5]; q = [3-1, 7-1] = [2, 6]; loss = -mean = -4
  np.testing.assert_allclose(float(info.extra.actor_loss), -4.0, rtol=1e-6)


def test_td3_golden_losses():
  from agents_tpu.agents.td3 import Td3Agent
  agent = Td3Agent(
      TSS, ACT,
      actor_network=Network(LinearActor(), TSS.observation),
      critic_network=Network(LinearCritic(2.0), (TSS.observation, ACT)),
      actor_optimizer=optax.sgd(0.0), critic_optimizer=optax.sgd(0.0),
      gamma=1.0, target_policy_noise=0.0, target_policy_noise_clip=0.0)
  state = agent.init(jax.random.key(0))
  _, info = jax.jit(agent.train)(state, _experience())
  # Twin critics share the same init (scale 2) so min(tq1, tq2) = tq1 and
  # the critic loss doubles DDPG's: 2 * 478.88.
  np.testing.assert_allclose(float(info.extra.critic_loss), 957.76,
                             rtol=1e-5)
  np.testing.assert_allclose(float(info.extra.actor_loss), -4.0, rtol=1e-6)


def test_sac_golden_losses():
  from agents_tpu.agents.sac import SacAgent
  agent = SacAgent(
      TSS, ACT,
      critic_network=Network(LinearCritic(2.0), (TSS.observation, ACT)),
      actor_network=Network(DeterministicDistActor(), TSS.observation),
      actor_optimizer=optax.sgd(0.0), critic_optimizer=optax.sgd(0.0),
      alpha_optimizer=optax.sgd(0.0), gamma=1.0,
      initial_log_alpha=0.0, target_entropy=-1.0)
  state = agent.init(jax.random.key(0))
  _, info = jax.jit(agent.train)(state, _experience())
  # log_pi = 0 everywhere, alpha = exp(0) = 1:
  # critic: target_value = min twin = 10, 14 (same init) - 1*0
  #   td = [19, 32.6]; q1 = q2 = [5, 5]
  #   per = 2 * [(14)^2, (27.6)^2]; mean = 957.76; reported loss is
  #   weighted by critic_loss_weight = 0.5 (reference sac_agent.py:74)
  np.testing.assert_allclose(float(info.extra.critic_loss), 478.88,
                             rtol=1e-5)
  # actor: a = pi(obs0) = [-0.5, -0.5]; q = [3-1, 7-1]; per = 1*0 - q
  np.testing.assert_allclose(float(info.extra.actor_loss), -4.0, rtol=1e-6)
  # alpha: per = -log_alpha * (log_pi + target_entropy) = -0*(0-1) = 0
  np.testing.assert_allclose(float(info.extra.alpha_loss), 0.0, atol=1e-7)


def test_project_distribution_golden():
  from agents_tpu.agents.categorical_dqn import project_distribution
  target = jnp.array([-1.0, 0.0, 1.0])
  # Atoms exactly on grid points split nothing.
  out = project_distribution(jnp.array([[-1.0, 1.0]]),
                             jnp.array([[0.5, 0.5]]), target)
  np.testing.assert_allclose(np.asarray(out[0]), [0.5, 0.0, 0.5], atol=1e-6)
  # Out-of-range atom clips to the edge; mid atom splits linearly.
  out = project_distribution(jnp.array([[-2.0, 0.5]]),
                             jnp.array([[0.4, 0.6]]), target)
  np.testing.assert_allclose(np.asarray(out[0]), [0.4, 0.3, 0.3], atol=1e-6)


class ConstantLogitsNet(nn.Module):
  """[B, 2 actions, 3 atoms] logits independent of obs: action 0 logits
  [ln 2, 0, 0], action 1 logits [0, 0, ln 2]."""

  @nn.compact
  def __call__(self, observation, step_type=None, network_state=()):
    base = self.param(
        "logits", lambda k, s: jnp.log(jnp.array(
            [[2.0, 1.0, 1.0], [1.0, 1.0, 2.0]])), (2, 3))
    batch = jnp.shape(jax.tree_util.tree_leaves(observation)[0])[0]
    return jnp.broadcast_to(base, (batch, 2, 3)), network_state


def test_c51_golden_loss():
  from agents_tpu.agents.categorical_dqn import CategoricalDqnAgent
  dact = specs.BoundedArraySpec((), np.int32, 0, 1)
  net = Network(ConstantLogitsNet(), TSS.observation)
  net.num_atoms = 3
  agent = CategoricalDqnAgent(TSS, dact, net, optax.sgd(0.0),
                              min_q_value=-1.0, max_q_value=1.0, gamma=0.0)
  state = agent.init(jax.random.key(0))
  obs = jnp.array([[[1., 2.], [5., 6.]], [[3., 4.], [7., 8.]]])
  exp = tj.Trajectory(
      step_type=jnp.array([[0, 1], [0, 1]], jnp.int32),
      observation=obs,
      action=jnp.array([[0, 0], [1, 1]], jnp.int32),
      policy_info=(),
      next_step_type=jnp.array([[1, 1], [1, 1]], jnp.int32),
      reward=jnp.array([[0., 0.], [1., 1.]]),
      discount=jnp.array([[1., 1.], [1., 1.]]),
  )
  _, info = jax.jit(agent.train)(state, exp)
  # gamma=0: shifted support = reward -> delta at r projected on
  # support [-1, 0, 1]:
  #   row0 (r=0, action 0): target [0, 1, 0];
  #     log_softmax(action-0 logits [ln2,0,0]) at atom1 = -ln 4
  #     ce0 = ln 4
  #   row1 (r=1, action 1): target [0, 0, 1];
  #     log_softmax(action-1 logits [0,0,ln2]) at atom2 = ln(2/4) = -ln 2
  #     ce1 = ln 2
  # loss = (ln4 + ln2)/2 = 1.5 ln 2
  np.testing.assert_allclose(float(info.loss), 1.5 * np.log(2.0),
                             rtol=1e-6)


class ConstNormalActor(nn.Module):
  """pi = Normal(0, 1) regardless of obs (scalar action)."""

  @nn.compact
  def __call__(self, observation, step_type=None, network_state=()):
    from agents_tpu.distributions.distributions import Normal
    b = self.param("b", lambda k, s: jnp.zeros(()), ())
    batch = jnp.shape(jax.tree_util.tree_leaves(observation)[0])[0]
    loc = jnp.zeros((batch,)) + b
    return Normal(loc=loc, scale=jnp.ones((batch,))), network_state


class ConstValueNet(nn.Module):
  """V = 3."""

  @nn.compact
  def __call__(self, observation, step_type=None, network_state=()):
    v = self.param("v", lambda k, s: jnp.asarray(3.0), ())
    batch = jnp.shape(jax.tree_util.tree_leaves(observation)[0])[0]
    return jnp.full((batch,), v), network_state


def test_ppo_clip_loss_golden():
  """Mirrors ppo_agent_test.py's policy_gradient_loss /
  value_estimation_loss golden tests, via PPOAgent._loss on a hand-built
  minibatch: old policy Normal(0, 2), new policy Normal(0, 1), actions 0
  -> importance ratio = exactly 2 -> clipped at 1.2."""
  from agents_tpu.agents.ppo import PPOAgent
  from agents_tpu.distributions.distributions import Normal

  sact = specs.BoundedArraySpec((), np.float32, -10.0, 10.0)
  agent = PPOAgent(
      TSS, sact, optax.sgd(0.0),
      actor_network=Network(ConstNormalActor(), TSS.observation),
      value_network=Network(ConstValueNet(), TSS.observation),
      importance_ratio_clipping=0.2, entropy_regularization=0.0,
      normalize_observations=False, normalize_rewards=False,
      value_pred_loss_coef=0.5)
  st = agent.init(jax.random.key(0))

  B = 2
  obs = jnp.zeros((B, 2))
  actions = jnp.zeros((B,))
  old_dist = Normal(loc=jnp.zeros((B,)), scale=2.0 * jnp.ones((B,)))
  from agents_tpu.utils import common
  old_log_prob = common.log_probability(old_dist, actions)
  batch = (obs, jnp.ones((B,), jnp.int32), actions, old_dist,
           jnp.full((B,), 3.0),                       # old values
           jnp.asarray([5.0, 1.0]),                   # returns
           jnp.asarray([1.0, -1.0]),                  # advantages
           old_log_prob, jnp.ones((B,)))              # mask
  total, (extra, mean_kl) = agent._loss(
      (st.actor_params, st.value_params), st, batch)
  # ratio = N(0,1)(0)/N(0,2)(0) = 2 exactly.
  #   A=+1: -min(2*1, 1.2*1) = -1.2 ; A=-1: -min(-2, -1.2) = 2
  #   pg = ( -1.2 + 2 ) / 2 = 0.4 ; clip_fraction = 1.0
  np.testing.assert_allclose(float(extra.policy_gradient_loss), 0.4,
                             rtol=1e-6)
  np.testing.assert_allclose(float(extra.clip_fraction), 1.0)
  # V = 3, returns [5, 1]: 0.5 * mean([4, 4]) = 2
  np.testing.assert_allclose(float(extra.value_estimation_loss), 2.0,
                             rtol=1e-6)
  # KL(N(0,2) || N(0,1)) = ln(1/2) + 4/2 - 1/2
  np.testing.assert_allclose(float(mean_kl),
                             np.log(0.5) + 2.0 - 0.5, rtol=1e-6)
  # beta = 0, cutoff off -> total = pg + value
  np.testing.assert_allclose(float(total), 2.4, rtol=1e-6)
