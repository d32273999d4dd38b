"""Neural bandit agents.

Analogues of ``tf_agents/bandits/agents/``:
  - GreedyRewardPredictionAgent (greedy_reward_prediction_agent.py:446-ish)
  - NeuralEpsilonGreedyAgent (neural_epsilon_greedy_agent.py:163)
  - NeuralBoltzmannAgent (neural_boltzmann_agent.py:172)
  - NeuralFalconAgent (neural_falcon_agent.py:186; inverse-gap weighting)
  - BernoulliThompsonSamplingAgent (bernoulli_thompson_sampling_agent.py:205)
  - Exp3Agent (exp3_agent.py:191)
  - NeuralLinUcbAgent (neural_linucb_agent.py:687; encoder + LinUCB head)

The reward network is any Q-style network mapping observation ->
[B, num_actions] predicted rewards.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from agents_tpu import distributions as dist_lib
from agents_tpu.agents.agent import Agent
from agents_tpu.policies.policy import Policy
from agents_tpu.policies.q_policy import QPolicy
from agents_tpu.policies.wrappers import (BoltzmannPolicy,
                                          EpsilonGreedyPolicy, GreedyPolicy)
from agents_tpu.trajectories import policy_step as ps
from agents_tpu.utils import common
from agents_tpu.utils.common import LossInfo


@struct.dataclass
class RewardNetAgentState:
  params: Any
  opt_state: Any
  train_step: jax.Array


def _squeeze_bandit_batch(experience):
  """Accept [B, 1, ...] length-1 episodes or flat [B, ...] (keyed on
  step_type rank — rewards may legitimately have inner dims for
  multi-objective / slate feedback)."""
  if experience.step_type.ndim == 2:
    return jax.tree_util.tree_map(lambda x: x[:, 0], experience)
  return experience


class _ConstrainedGreedyPolicy(Policy):
  """Greedy over predicted rewards masked by constraint feasibility
  (reference greedy_reward_prediction_policy.py + constraints.py:575).
  Feasibility is Bernoulli-sampled when a key is supplied (collection),
  thresholded at 0.5 when not (deterministic eval)."""

  def __init__(self, time_step_spec, action_spec, reward_network,
               constraints, splitter, epsilon: float = 0.0):
    super().__init__(time_step_spec, action_spec, clip=False)
    self.reward_network = reward_network
    self.constraints = tuple(constraints)
    self.splitter = splitter
    self.epsilon = epsilon
    self.num_actions = action_spec.num_values

  def _masked_preds(self, params, time_step, state, key):
    from agents_tpu.bandits.policies import constraints as constraints_lib
    obs = time_step.observation
    if key is not None:
      obs, mask = constraints_lib.construct_mask_from_multiple_sources(
          key, obs, self.splitter, self.constraints, params["constraints"],
          self.num_actions)
    else:
      if self.splitter is not None:
        obs, mask = self.splitter(obs)
      else:
        mask = None
      prob = constraints_lib.compute_feasibility_probability(
          obs, self.constraints, params["constraints"], self.num_actions,
          mask)
      mask = (prob >= 0.5).astype(jnp.int32)
    preds, new_state = self.reward_network.apply(
        params["reward"], obs, time_step.step_type, state)
    if mask is not None:
      masked = jnp.where(mask > 0, preds, -1e9)
      any_valid = jnp.any(mask > 0, axis=-1, keepdims=True)
      preds = jnp.where(any_valid, masked, preds)
    return preds, new_state

  def _action(self, params, time_step, state, key):
    k_mask, k_eps, k_rand = (jax.random.split(key, 3) if key is not None
                             else (None, None, None))
    preds, new_state = self._masked_preds(params, time_step, state, k_mask)
    action = jnp.argmax(preds, axis=-1)
    if self.epsilon and key is not None:
      batch = jnp.shape(time_step.step_type)
      rand = jax.random.randint(k_rand, batch, 0, self.num_actions)
      explore = jax.random.uniform(k_eps, batch) < self.epsilon
      action = jnp.where(explore, rand, action)
    return ps.PolicyStep(
        action=action.astype(jnp.dtype(self.action_spec.dtype)),
        state=new_state, info=())

  def _distribution(self, params, time_step, state):
    preds, new_state = self._masked_preds(params, time_step, state, None)
    return ps.PolicyStep(
        action=dist_lib.Categorical(
            jnp.where(preds >= jnp.max(preds, axis=-1, keepdims=True),
                      0.0, -1e9),
            dtype=jnp.dtype(self.action_spec.dtype)),
        state=new_state, info=())


class GreedyRewardPredictionAgent(Agent):
  """Supervised reward net + greedy arm choice (reference
  greedy_reward_prediction_agent.py). With `constraints`, the reward is a
  dict {REWARD_SPEC_KEY, CONSTRAINTS_SPEC_KEY: [B, n_c]} and each
  constraint's network trains jointly (reference :397-415); the policies
  mask infeasible arms."""

  def __init__(self, time_step_spec, action_spec, reward_network, optimizer,
               error_loss_fn: Callable = common.element_wise_squared_loss,
               gradient_clipping: Optional[float] = None,
               constraints=(),
               observation_and_action_constraint_splitter=None):
    self.time_step_spec = time_step_spec
    self.action_spec = action_spec
    self.reward_network = reward_network
    self.optimizer = optimizer
    self.error_loss_fn = error_loss_fn
    self.gradient_clipping = gradient_clipping
    self.num_actions = action_spec.num_values
    self.train_sequence_length = None
    self.constraints = tuple(constraints)
    self.splitter = observation_and_action_constraint_splitter

    if self.constraints:
      self.policy = _ConstrainedGreedyPolicy(
          time_step_spec, action_spec, reward_network, self.constraints,
          self.splitter)
      self.collect_policy = self._make_constrained_collect_policy()
      self._q_policy = None
    else:
      q_policy = QPolicy(time_step_spec, action_spec, reward_network,
                         self.splitter)
      self.policy = GreedyPolicy(q_policy)
      self.collect_policy = self._make_collect_policy(q_policy)
      self._q_policy = q_policy

  def _make_collect_policy(self, q_policy):
    return GreedyPolicy(q_policy)

  def _make_constrained_collect_policy(self):
    return self.policy

  def init(self, key) -> RewardNetAgentState:
    if self.constraints:
      keys = jax.random.split(key, 1 + len(self.constraints))
      params = {
          "reward": self.reward_network.init_params(keys[0]),
          "constraints": tuple(
              c.init_params(k) for c, k in zip(self.constraints, keys[1:])),
      }
    else:
      params = self.reward_network.init_params(key)
    return RewardNetAgentState(params=params,
                               opt_state=self.optimizer.init(params),
                               train_step=jnp.zeros((), jnp.int32))

  def policy_params(self, agent_state):
    return agent_state.params

  def _loss(self, params, experience, weights=None):
    from agents_tpu.bandits.specs import bandit_spec_utils as bsu
    exp = _squeeze_bandit_batch(experience)
    if not self.constraints:
      obs = exp.observation
      if self.splitter is not None:
        # Train on the same split observation the policy acts on — the
        # raw composite (obs, mask) must not reach the reward network.
        obs, _ = self.splitter(obs)
      preds, _ = self.reward_network.apply(
          params, obs, exp.step_type, ())
      chosen = common.index_with_actions(preds, exp.action)
      per_example = self.error_loss_fn(exp.reward, chosen)
      return common.aggregate_losses(per_example_loss=per_example,
                                     sample_weight=weights)
    obs = exp.observation
    if self.splitter is not None:
      obs, _ = self.splitter(obs)
    rewards = exp.reward[bsu.REWARD_SPEC_KEY]
    preds, _ = self.reward_network.apply(
        params["reward"], obs, exp.step_type, ())
    chosen = common.index_with_actions(preds, exp.action)
    per_example = self.error_loss_fn(rewards, chosen)
    loss = common.aggregate_losses(per_example_loss=per_example,
                                   sample_weight=weights)
    targets = exp.reward[bsu.CONSTRAINTS_SPEC_KEY]
    for i, c in enumerate(self.constraints):
      loss = loss + c.compute_loss(params["constraints"][i], obs,
                                   exp.action, targets[:, i], weights)
    return loss

  def train(self, agent_state, experience,
            weights=None) -> Tuple[RewardNetAgentState, LossInfo]:
    loss, grads = jax.value_and_grad(self._loss)(
        agent_state.params, experience, weights)
    if self.gradient_clipping is not None:
      grads = common.clip_gradient_norms(grads, self.gradient_clipping)
    updates, opt_state = self.optimizer.update(
        grads, agent_state.opt_state, agent_state.params)
    params = optax.apply_updates(agent_state.params, updates)
    return RewardNetAgentState(
        params=params, opt_state=opt_state,
        train_step=agent_state.train_step + 1), LossInfo(loss, ())


class NeuralEpsilonGreedyAgent(GreedyRewardPredictionAgent):
  """reference neural_epsilon_greedy_agent.py:163."""

  def __init__(self, *args, epsilon: float = 0.1, **kwargs):
    self._epsilon = epsilon
    super().__init__(*args, **kwargs)

  def _make_collect_policy(self, q_policy):
    return EpsilonGreedyPolicy(q_policy, self._epsilon)

  def _make_constrained_collect_policy(self):
    return _ConstrainedGreedyPolicy(
        self.time_step_spec, self.action_spec, self.reward_network,
        self.constraints, self.splitter, epsilon=self._epsilon)


class NeuralBoltzmannAgent(GreedyRewardPredictionAgent):
  """reference neural_boltzmann_agent.py:172."""

  def __init__(self, *args, temperature: float = 1.0, **kwargs):
    self._temperature = temperature
    super().__init__(*args, **kwargs)

  def _make_collect_policy(self, q_policy):
    return BoltzmannPolicy(q_policy, self._temperature)


class _FalconPolicy(Policy):
  """FALCON inverse-gap weighting (reference neural_falcon_agent /
  falcon_reward_prediction_policy): p(a) proportional to
  1 / (K + gamma * (r_best - r_a)); best arm gets the remainder."""

  def __init__(self, time_step_spec, action_spec, reward_network,
               exploitation_coefficient_fn):
    super().__init__(time_step_spec, action_spec, clip=False)
    self.reward_network = reward_network
    self.gamma_fn = exploitation_coefficient_fn
    self.num_actions = action_spec.num_values

  def _distribution(self, params, time_step, state):
    net_params, train_step = params["net"], params["train_step"]
    preds, _ = self.reward_network.apply(
        net_params, time_step.observation, time_step.step_type, ())
    gamma = self.gamma_fn(train_step)
    best = jnp.max(preds, axis=-1, keepdims=True)
    gaps = best - preds
    K = self.num_actions
    probs = 1.0 / (K + gamma * gaps)
    is_best = (preds == best).astype(probs.dtype)
    # All best-arm mass = 1 - sum of non-best probs.
    non_best = jnp.sum(probs * (1 - is_best), axis=-1, keepdims=True)
    n_best = jnp.maximum(jnp.sum(is_best, axis=-1, keepdims=True), 1.0)
    probs = probs * (1 - is_best) + is_best * (1 - non_best) / n_best
    logits = jnp.log(jnp.maximum(probs, 1e-12))
    return ps.PolicyStep(
        action=dist_lib.Categorical(
            logits, dtype=jnp.dtype(self.action_spec.dtype)),
        state=state, info=())


class NeuralFalconAgent(GreedyRewardPredictionAgent):
  """reference neural_falcon_agent.py:186; gamma grows with sqrt of
  training samples."""

  def __init__(self, *args, exploitation_coefficient: float = 1.0,
               **kwargs):
    self._coef = exploitation_coefficient
    super().__init__(*args, **kwargs)
    self.collect_policy = _FalconPolicy(
        self.time_step_spec, self.action_spec, self.reward_network,
        lambda step: self._coef * jnp.sqrt(step.astype(jnp.float32) + 1.0))

  def policy_params(self, agent_state):
    return agent_state.params

  def collect_policy_params(self, agent_state):
    return {"net": agent_state.params, "train_step": agent_state.train_step}


@struct.dataclass
class BernoulliTSState:
  alpha: jax.Array  # [K] successes + 1
  beta: jax.Array   # [K] failures + 1
  train_step: jax.Array


class _BernoulliTSPolicy(Policy):

  def __init__(self, time_step_spec, action_spec):
    super().__init__(time_step_spec, action_spec, clip=False)

  def _action(self, params, time_step, state, key):
    batch = jnp.shape(time_step.step_type)
    theta = jax.random.beta(
        key, params.alpha[None], params.beta[None],
        batch + params.alpha.shape)
    action = jnp.argmax(theta, axis=-1).astype(
        jnp.dtype(self.action_spec.dtype))
    return ps.PolicyStep(action=action, state=state, info=())

  def _distribution(self, params, time_step, state):
    raise NotImplementedError


class BernoulliThompsonSamplingAgent(Agent):
  """Beta-Bernoulli posterior per arm (reference
  bernoulli_thompson_sampling_agent.py:205)."""

  def __init__(self, time_step_spec, action_spec, batch_size: int = 1):
    self.time_step_spec = time_step_spec
    self.action_spec = action_spec
    self.num_actions = action_spec.num_values
    self.train_sequence_length = None
    self.policy = _BernoulliTSPolicy(time_step_spec, action_spec)
    self.collect_policy = self.policy

  def init(self, key) -> BernoulliTSState:
    del key
    return BernoulliTSState(
        alpha=jnp.ones((self.num_actions,)),
        beta=jnp.ones((self.num_actions,)),
        train_step=jnp.zeros((), jnp.int32))

  def policy_params(self, agent_state):
    return agent_state

  def train(self, agent_state, experience, weights=None):
    exp = _squeeze_bandit_batch(experience)
    onehot = jax.nn.one_hot(exp.action.astype(jnp.int32), self.num_actions)
    success = jnp.sum(onehot * exp.reward[:, None], axis=0)
    failure = jnp.sum(onehot * (1.0 - exp.reward)[:, None], axis=0)
    new_state = BernoulliTSState(
        alpha=agent_state.alpha + success,
        beta=agent_state.beta + failure,
        train_step=agent_state.train_step + 1)
    return new_state, LossInfo(-jnp.mean(exp.reward), ())


@struct.dataclass
class Exp3State:
  log_weights: jax.Array  # [K]
  train_step: jax.Array


class _Exp3Policy(Policy):

  def __init__(self, time_step_spec, action_spec, learning_rate):
    super().__init__(time_step_spec, action_spec, clip=False)
    self.learning_rate = learning_rate

  def _distribution(self, params, time_step, state):
    batch = jnp.shape(time_step.step_type)
    logits = jnp.broadcast_to(params.log_weights,
                              batch + params.log_weights.shape)
    return ps.PolicyStep(
        action=dist_lib.Categorical(
            logits, dtype=jnp.dtype(self.action_spec.dtype)),
        state=state, info=())


class Exp3Agent(Agent):
  """Adversarial bandit: exponential weights with importance-weighted
  reward estimates (reference exp3_agent.py:191)."""

  def __init__(self, time_step_spec, action_spec,
               learning_rate: float = 0.1):
    self.time_step_spec = time_step_spec
    self.action_spec = action_spec
    self.num_actions = action_spec.num_values
    self.learning_rate = learning_rate
    self.train_sequence_length = None
    self.policy = _Exp3Policy(time_step_spec, action_spec, learning_rate)
    self.collect_policy = self.policy

  def init(self, key) -> Exp3State:
    del key
    return Exp3State(log_weights=jnp.zeros((self.num_actions,)),
                     train_step=jnp.zeros((), jnp.int32))

  def policy_params(self, agent_state):
    return agent_state

  def train(self, agent_state, experience, weights=None):
    exp = _squeeze_bandit_batch(experience)
    probs = jax.nn.softmax(agent_state.log_weights)
    onehot = jax.nn.one_hot(exp.action.astype(jnp.int32), self.num_actions)
    # Importance-weighted reward estimate per arm.
    est = jnp.sum(
        onehot * (exp.reward[:, None] / jnp.maximum(probs[None], 1e-8)),
        axis=0)
    new_state = Exp3State(
        log_weights=agent_state.log_weights + self.learning_rate * est,
        train_step=agent_state.train_step + 1)
    return new_state, LossInfo(-jnp.mean(exp.reward), ())


@struct.dataclass
class NeuralLinUcbState:
  encoder_params: Any
  opt_state: Any
  a_mat: jax.Array
  b_vec: jax.Array
  train_step: jax.Array


class _NeuralLinUcbPolicy(Policy):
  """UCB over encoded features (reference neural_linucb_policy.py)."""

  def __init__(self, time_step_spec, action_spec, head_module, alpha,
               epsilon_greedy, encoding_phase_steps):
    super().__init__(time_step_spec, action_spec, clip=False)
    self.head_module = head_module
    self.alpha = alpha
    self.epsilon_greedy = epsilon_greedy
    self.encoding_phase_steps = encoding_phase_steps
    self.num_actions = action_spec.num_values

  def _action(self, params, time_step, state, key):
    (feats, _), _ = self.head_module.apply(
        params.encoder_params, time_step.observation, time_step.step_type,
        ())                                                   # [B, d]
    chol = jnp.linalg.cholesky(params.a_mat)
    theta = jax.scipy.linalg.cho_solve(
        (chol, True), params.b_vec[..., None])[..., 0]        # [K, d]
    est = jnp.einsum("bd,kd->bk", feats, theta)
    z = jax.scipy.linalg.cho_solve(
        (chol, True),
        jnp.broadcast_to(feats.T[None], (chol.shape[0],) + feats.T.shape))
    var = jnp.einsum("bd,kdb->bk", feats, z)
    ucb = est + self.alpha * jnp.sqrt(jnp.maximum(var, 0.0))
    ucb_action = jnp.argmax(ucb, axis=-1)

    # Epsilon-greedy during the encoder-training phase (reference
    # alternates phases, neural_linucb_agent.py).
    k_eps, k_rand = jax.random.split(key)
    batch = jnp.shape(time_step.step_type)
    random_action = jax.random.randint(k_rand, batch, 0, self.num_actions)
    explore = jax.random.uniform(k_eps, batch) < self.epsilon_greedy
    in_encoding_phase = params.train_step < self.encoding_phase_steps
    action = jnp.where(in_encoding_phase & explore, random_action,
                       ucb_action)
    return ps.PolicyStep(
        action=action.astype(jnp.dtype(self.action_spec.dtype)),
        state=state, info=())

  def _distribution(self, params, time_step, state):
    raise NotImplementedError


class NeuralLinUcbAgent(Agent):
  """Encoder net + LinUCB head on latent features (reference
  neural_linucb_agent.py:687). During `encoding_phase_steps` the encoder
  trains through a reward head; afterwards only (A, b) update."""

  def __init__(self, time_step_spec, action_spec, encoding_network,
               encoding_dim: int, optimizer, alpha: float = 1.0,
               gamma: float = 1.0, epsilon_greedy: float = 0.1,
               encoding_phase_steps: int = 100):
    import flax.linen as nn

    self.time_step_spec = time_step_spec
    self.action_spec = action_spec
    self.encoder = encoding_network
    self.encoding_dim = encoding_dim
    self.optimizer = optimizer
    self.alpha = alpha
    self.gamma = gamma
    self.num_actions = action_spec.num_values
    self.encoding_phase_steps = encoding_phase_steps
    self.train_sequence_length = None

    # Reward head used only for encoder training.
    class _WithHead(nn.Module):
      encoder: Any
      num_actions: int

      @nn.compact
      def __call__(self, obs, step_type=None, state=()):
        feats, state = self.encoder(obs, step_type, state)
        r = nn.Dense(self.num_actions)(feats)
        return (feats, r), state

    self._head_module = _WithHead(encoding_network.module, self.num_actions)
    self.policy = _NeuralLinUcbPolicy(
        time_step_spec, action_spec, self._head_module, alpha,
        epsilon_greedy, encoding_phase_steps)
    self.collect_policy = self.policy

  def init(self, key) -> NeuralLinUcbState:
    from agents_tpu.specs import array_spec
    obs = array_spec.zero_spec_nest(
        self.time_step_spec.observation, outer_dims=(1,))
    params = self._head_module.init(
        key, obs, jnp.zeros((1,), jnp.int32), ())
    K, d = self.num_actions, self.encoding_dim
    return NeuralLinUcbState(
        encoder_params=params,
        opt_state=self.optimizer.init(params),
        a_mat=jnp.broadcast_to(jnp.eye(d), (K, d, d)).copy(),
        b_vec=jnp.zeros((K, d)),
        train_step=jnp.zeros((), jnp.int32))

  def policy_params(self, agent_state):
    return agent_state

  def train(self, agent_state, experience, weights=None):
    exp = _squeeze_bandit_batch(experience)

    def loss_fn(params):
      (feats, preds), _ = self._head_module.apply(
          params, exp.observation, exp.step_type, ())
      chosen = common.index_with_actions(preds, exp.action)
      return jnp.mean(jnp.square(exp.reward - chosen)), feats

    (loss, feats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        agent_state.encoder_params)
    in_phase = agent_state.train_step < self.encoding_phase_steps
    updates, opt_state = self.optimizer.update(
        grads, agent_state.opt_state, agent_state.encoder_params)
    new_params = optax.apply_updates(agent_state.encoder_params, updates)
    encoder_params = jax.tree_util.tree_map(
        lambda n, o: jnp.where(in_phase, n, o), new_params,
        agent_state.encoder_params)
    opt_state = jax.tree_util.tree_map(
        lambda n, o: jnp.where(in_phase, n, o), opt_state,
        agent_state.opt_state)

    feats = jax.lax.stop_gradient(feats)
    onehot = jax.nn.one_hot(exp.action.astype(jnp.int32), self.num_actions)
    delta_a = jnp.einsum("bk,bi,bj->kij", onehot, feats, feats)
    delta_b = jnp.einsum("bk,b,bi->ki", onehot, exp.reward, feats)
    # Train encoder XOR update the (A, b) posterior (reference
    # neural_linucb_agent.py phase alternation): features extracted while
    # the encoder is still moving would permanently contaminate the UCB
    # statistics accumulated for later phases.
    g, d = self.gamma, delta_a.shape[-1]
    # Re-add the decayed identity prior so gamma < 1 forgetting cannot
    # decay A toward singular for rarely-pulled arms (mirrors
    # linear_bandit_agent.py:104-105).
    eye = jnp.eye(d, dtype=delta_a.dtype)[None]
    a_next = g * agent_state.a_mat + (1 - g) * eye + delta_a
    b_next = g * agent_state.b_vec + delta_b
    keep = in_phase  # encoding phase: (A, b) frozen
    new_state = NeuralLinUcbState(
        encoder_params=encoder_params, opt_state=opt_state,
        a_mat=jnp.where(keep, agent_state.a_mat, a_next),
        b_vec=jnp.where(keep, agent_state.b_vec, b_next),
        train_step=agent_state.train_step + 1)
    return new_state, LossInfo(loss, ())
