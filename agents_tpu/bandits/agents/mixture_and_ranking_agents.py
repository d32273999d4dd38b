"""Mixture, dropout-TS, multi-objective, and ranking bandit agents.

Analogues of ``tf_agents/bandits/agents/``:
  - MixtureAgent / StaticMixtureAgent / Exp3MixtureAgent (exp3_mixture_
    agent.py, mixture_agent.py): a categorical mixture over sub-agents;
    each round one sub-agent acts; all sub-agents train on the round.
  - DropoutThompsonSamplingAgent (dropout_thompson_sampling_agent.py:193):
    TS via a permanently-stochastic dropout net.
  - GreedyMultiObjectiveNeuralAgent
    (greedy_multi_objective_neural_agent.py:447): one reward head per
    objective, scalarized for arm choice.
  - RankingAgent (ranking_agent.py:458): slate construction by iterative
    penalized scoring (cascading feedback, simplified diversity penalty).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from agents_tpu import distributions as dist_lib
from agents_tpu.agents.agent import Agent
from agents_tpu.bandits.agents.neural_bandit_agents import (
    GreedyRewardPredictionAgent, RewardNetAgentState, _squeeze_bandit_batch)
from agents_tpu.policies.policy import Policy
from agents_tpu.trajectories import policy_step as ps
from agents_tpu.utils import common
from agents_tpu.utils.common import LossInfo


# ---------------------------------------------------------------------------
# Mixture agents
# ---------------------------------------------------------------------------


@struct.dataclass
class MixtureAgentState:
  sub_states: Tuple
  mixture_log_weights: jax.Array
  train_step: jax.Array


class _MixturePolicy(Policy):

  def __init__(self, time_step_spec, action_spec, sub_policies):
    from agents_tpu.specs import array_spec as _aspec
    # The chosen component AND its behavior probability ride in
    # policy_info so Exp3 credit can go to the sub-agent that actually
    # produced the action, importance-weighted by the probability AT
    # COLLECTION TIME (reference exp3_mixture_agent.py MixtureInfo).
    # Dividing by the softmax of the CURRENT weights instead would bias
    # the r/p estimator whenever experience is replayed or lagged.
    super().__init__(
        time_step_spec, action_spec, clip=False,
        info_spec={
            "mixture_choice": _aspec.BoundedArraySpec(
                (), np.int32, 0, len(sub_policies) - 1, "mixture_choice"),
            "mixture_prob": _aspec.ArraySpec((), np.float32,
                                             "mixture_prob"),
        })
    self.sub_policies = tuple(sub_policies)

  def _action(self, params, time_step, state, key):
    agent_state, sub_params = params
    k_choice, *k_subs = jax.random.split(key, len(self.sub_policies) + 1)
    batch = jnp.shape(time_step.step_type)
    choice = jax.random.categorical(
        k_choice,
        jnp.broadcast_to(agent_state.mixture_log_weights,
                         batch + agent_state.mixture_log_weights.shape))
    actions = [
        pol._action(p, time_step, (), k).action
        for pol, p, k in zip(self.sub_policies, sub_params, k_subs)
    ]
    stacked = jnp.stack(actions, axis=0)  # [N, B]
    action = jnp.take_along_axis(stacked, choice[None, :], axis=0)[0]
    probs = jax.nn.softmax(agent_state.mixture_log_weights)
    return ps.PolicyStep(
        action=action, state=state,
        info={"mixture_choice": choice.astype(jnp.int32),
              "mixture_prob": probs[choice].astype(jnp.float32)})

  def _distribution(self, params, time_step, state):
    raise NotImplementedError


class MixtureAgent(Agent):
  """Fixed or learned categorical mixture over sub-agents."""

  def __init__(self, time_step_spec, action_spec, agents: Sequence[Agent],
               mixture_weights: Optional[Sequence[float]] = None,
               learning_rate: float = 0.0):
    self.time_step_spec = time_step_spec
    self.action_spec = action_spec
    self.agents = tuple(agents)
    self.learning_rate = learning_rate
    self.train_sequence_length = None
    if mixture_weights is None:
      mixture_weights = [1.0] * len(agents)
    self._init_logw = jnp.log(
        jnp.asarray(mixture_weights) / jnp.sum(jnp.asarray(mixture_weights)))
    self.policy = _MixturePolicy(
        time_step_spec, action_spec,
        [a.collect_policy for a in self.agents])
    self.collect_policy = self.policy

  def init(self, key) -> MixtureAgentState:
    keys = jax.random.split(key, len(self.agents))
    return MixtureAgentState(
        sub_states=tuple(a.init(k) for a, k in zip(self.agents, keys)),
        mixture_log_weights=self._init_logw,
        train_step=jnp.zeros((), jnp.int32))

  def policy_params(self, agent_state):
    return (agent_state,
            tuple(a.policy_params(s)
                  for a, s in zip(self.agents, agent_state.sub_states)))

  def train(self, agent_state, experience, weights=None):
    new_subs, losses = [], []
    for a, s in zip(self.agents, agent_state.sub_states):
      ns, li = a.train(s, experience)
      new_subs.append(ns)
      losses.append(li.loss)
    logw = agent_state.mixture_log_weights
    if self.learning_rate > 0:
      exp = _squeeze_bandit_batch(experience)
      # Exp3: importance-weighted credit ONLY to the component that
      # produced each action, r/p_c with p_c the behavior probability
      # RECORDED at collection time (reference exp3_mixture_agent.py).
      # Crediting every component with mean_r/p_i would boost
      # low-probability components fastest regardless of merit; using
      # softmax(current logw) instead of the stored p_c would bias the
      # estimator on replayed/lagged experience (round-4 advisor).
      choice = exp.policy_info["mixture_choice"].astype(jnp.int32)
      behavior_prob = exp.policy_info["mixture_prob"]        # [B]
      onehot = jax.nn.one_hot(choice, len(self.agents))      # [B, N]
      est = onehot * (exp.reward
                      / jnp.maximum(behavior_prob, 1e-8))[:, None]
      logw = logw + self.learning_rate * jnp.mean(est, axis=0)
    new_state = MixtureAgentState(
        sub_states=tuple(new_subs), mixture_log_weights=logw,
        train_step=agent_state.train_step + 1)
    total = losses[0]
    for l in losses[1:]:
      total = total + l
    return new_state, LossInfo(total, ())


class StaticMixtureAgent(MixtureAgent):
  def __init__(self, *args, **kwargs):
    kwargs["learning_rate"] = 0.0
    super().__init__(*args, **kwargs)


class Exp3MixtureAgent(MixtureAgent):
  def __init__(self, *args, learning_rate: float = 0.01, **kwargs):
    kwargs["learning_rate"] = learning_rate
    super().__init__(*args, **kwargs)


# ---------------------------------------------------------------------------
# Dropout Thompson sampling
# ---------------------------------------------------------------------------


class _DropoutTSPolicy(Policy):
  """Samples a dropout mask at act time -> approximate posterior sample."""

  def __init__(self, time_step_spec, action_spec, network):
    super().__init__(time_step_spec, action_spec, clip=False)
    self.network = network

  def _action(self, params, time_step, state, key):
    preds, _ = self.network.module.apply(
        params, time_step.observation, time_step.step_type, (),
        training=True, rngs={"dropout": key})
    action = jnp.argmax(preds, axis=-1).astype(
        jnp.dtype(self.action_spec.dtype))
    return ps.PolicyStep(action=action, state=state, info=())

  def _distribution(self, params, time_step, state):
    raise NotImplementedError


class DropoutThompsonSamplingAgent(GreedyRewardPredictionAgent):
  """reference dropout_thompson_sampling_agent.py:193 — the reward net
  must use dropout (PermanentVariableRateDropout analogue: dropout active
  at act time via training=True)."""

  def _make_collect_policy(self, q_policy):
    return _DropoutTSPolicy(self.time_step_spec, self.action_spec,
                            self.reward_network)

  def _loss(self, params, experience, weights=None):
    exp = _squeeze_bandit_batch(experience)
    preds, _ = self.reward_network.module.apply(
        params, exp.observation, exp.step_type, (), training=False)
    chosen = common.index_with_actions(preds, exp.action)
    per_example = self.error_loss_fn(exp.reward, chosen)
    return common.aggregate_losses(per_example_loss=per_example,
                                   sample_weight=weights)


# ---------------------------------------------------------------------------
# Multi-objective
# ---------------------------------------------------------------------------


class _ScalarizedGreedyPolicy(Policy):

  def __init__(self, time_step_spec, action_spec, networks_, scalarizer):
    super().__init__(time_step_spec, action_spec, clip=False)
    self.networks_ = tuple(networks_)
    self.scalarizer = scalarizer

  def _action(self, params, time_step, state, key):
    preds = [
        net.apply(p, time_step.observation, time_step.step_type, ())[0]
        for net, p in zip(self.networks_, params)
    ]                                                    # list of [B, K]
    stacked = jnp.stack(preds, axis=-1)                  # [B, K, O]
    scores = self.scalarizer(stacked)                    # [B, K]
    action = jnp.argmax(scores, axis=-1).astype(
        jnp.dtype(self.action_spec.dtype))
    return ps.PolicyStep(action=action, state=state, info=())

  def _distribution(self, params, time_step, state):
    raise NotImplementedError


@struct.dataclass
class MultiObjectiveState:
  params: Tuple
  opt_states: Tuple
  train_step: jax.Array


class GreedyMultiObjectiveNeuralAgent(Agent):
  """One reward network per objective; scalarized greedy arm choice
  (reference greedy_multi_objective_neural_agent.py:447). Experience
  reward must be [B, num_objectives]."""

  def __init__(self, time_step_spec, action_spec, objective_networks,
               scalarizer, optimizer):
    self.time_step_spec = time_step_spec
    self.action_spec = action_spec
    self.networks_ = tuple(objective_networks)
    self.scalarizer = scalarizer
    self.optimizer = optimizer
    self.train_sequence_length = None
    self.policy = _ScalarizedGreedyPolicy(time_step_spec, action_spec,
                                          self.networks_, scalarizer)
    self.collect_policy = self.policy

  def init(self, key) -> MultiObjectiveState:
    keys = jax.random.split(key, len(self.networks_))
    params = tuple(n.init_params(k) for n, k in zip(self.networks_, keys))
    return MultiObjectiveState(
        params=params,
        opt_states=tuple(self.optimizer.init(p) for p in params),
        train_step=jnp.zeros((), jnp.int32))

  def policy_params(self, agent_state):
    return agent_state.params

  def train(self, agent_state, experience, weights=None):
    exp = _squeeze_bandit_batch(experience)
    total = 0.0
    new_params, new_opts = [], []
    for i, (net, p, o) in enumerate(zip(self.networks_, agent_state.params,
                                        agent_state.opt_states)):
      def loss_fn(pp):
        preds, _ = net.apply(pp, exp.observation, exp.step_type, ())
        chosen = common.index_with_actions(preds, exp.action)
        target = exp.reward[..., i]
        return jnp.mean(jnp.square(target - chosen))

      loss, grads = jax.value_and_grad(loss_fn)(p)
      updates, o2 = self.optimizer.update(grads, o, p)
      new_params.append(optax.apply_updates(p, updates))
      new_opts.append(o2)
      total = total + loss
    return MultiObjectiveState(
        params=tuple(new_params), opt_states=tuple(new_opts),
        train_step=agent_state.train_step + 1), LossInfo(total, ())


# ---------------------------------------------------------------------------
# Ranking
# ---------------------------------------------------------------------------


class _RankingPolicy(Policy):
  """Builds a slate of `slate_size` items by iterative penalized scoring
  (ranking_policy.py's penalize-by-similarity flavor, simplified: after
  picking an item, later picks are penalized by cosine similarity to the
  already-picked arm features)."""

  def __init__(self, time_step_spec, action_spec, reward_network,
               slate_size, diversity_penalty=0.0):
    super().__init__(time_step_spec, action_spec, clip=False)
    self.reward_network = reward_network
    self.slate_size = slate_size
    self.diversity_penalty = diversity_penalty

  def _action(self, params, time_step, state, key):
    from agents_tpu.bandits.specs.bandit_spec_utils import (
        PER_ARM_FEATURE_KEY,)
    scores, _ = self.reward_network.apply(
        params, time_step.observation, time_step.step_type, ())  # [B, K]
    arms = time_step.observation[PER_ARM_FEATURE_KEY]
    norm = jnp.linalg.norm(arms, axis=-1, keepdims=True) + 1e-8
    unit = arms / norm

    def pick(carry, _):
      remaining_scores, chosen_mask, sim_penalty = carry
      eff = remaining_scores - self.diversity_penalty * sim_penalty
      eff = jnp.where(chosen_mask, -1e9, eff)
      idx = jnp.argmax(eff, axis=-1)                       # [B]
      onehot = jax.nn.one_hot(idx, eff.shape[-1], dtype=bool)
      picked_unit = jnp.take_along_axis(
          unit, idx[:, None, None], axis=1)                # [B, 1, a]
      sim = jnp.abs(jnp.sum(unit * picked_unit, axis=-1))  # [B, K]
      return (remaining_scores, chosen_mask | onehot,
              sim_penalty + sim), idx

    init = (scores, jnp.zeros(scores.shape, bool), jnp.zeros_like(scores))
    _, slate = jax.lax.scan(pick, init, None, length=self.slate_size)
    slate = jnp.moveaxis(slate, 0, 1).astype(
        jnp.dtype(self.action_spec.dtype))                  # [B, slate]
    return ps.PolicyStep(action=slate, state=state, info=())

  def _distribution(self, params, time_step, state):
    raise NotImplementedError


class RankingAgent(Agent):
  """Slate ranking with cascading-feedback training (reference
  ranking_agent.py:458): the clicked position's item trains the reward
  net; unclicked items above it train toward zero."""

  def __init__(self, time_step_spec, action_spec, reward_network, optimizer,
               slate_size: int, diversity_penalty: float = 0.0):
    self.time_step_spec = time_step_spec
    self.action_spec = action_spec
    self.reward_network = reward_network
    self.optimizer = optimizer
    self.slate_size = slate_size
    self.train_sequence_length = None
    self.policy = _RankingPolicy(time_step_spec, action_spec,
                                 reward_network, slate_size,
                                 diversity_penalty)
    self.collect_policy = self.policy

  def init(self, key) -> RewardNetAgentState:
    params = self.reward_network.init_params(key)
    return RewardNetAgentState(params=params,
                               opt_state=self.optimizer.init(params),
                               train_step=jnp.zeros((), jnp.int32))

  def policy_params(self, agent_state):
    return agent_state.params

  def train(self, agent_state, experience, weights=None):
    """experience.action: [B, slate]; experience.reward: [B, slate]
    per-position feedback (cascading: zeros above the click)."""
    exp = _squeeze_bandit_batch(experience)

    def loss_fn(params):
      preds, _ = self.reward_network.apply(
          params, exp.observation, exp.step_type, ())      # [B, K]
      slate_preds = jnp.take_along_axis(
          preds, exp.action.astype(jnp.int32), axis=-1)    # [B, slate]
      return jnp.mean(jnp.square(exp.reward - slate_preds))

    loss, grads = jax.value_and_grad(loss_fn)(agent_state.params)
    updates, opt_state = self.optimizer.update(
        grads, agent_state.opt_state, agent_state.params)
    params = optax.apply_updates(agent_state.params, updates)
    return RewardNetAgentState(
        params=params, opt_state=opt_state,
        train_step=agent_state.train_step + 1), LossInfo(loss, ())
