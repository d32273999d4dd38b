"""Per-arm-feature, action-masked, and ranking bandit environments.

Analogues of:
  - tf_agents/bandits/environments/stationary_stochastic_per_arm_py_environment.py:33
    (StationaryStochasticPerArmPyEnvironment)
  - tf_agents/bandits/environments/bernoulli_action_mask_tf_environment.py:72
    (BernoulliActionMaskTFEnvironment)
  - tf_agents/bandits/environments/ranking_environment.py:78
    (RankingPyEnvironment, FeedbackModel, ClickModel)

The reference builds observations with host-side Python loops over the
batch; here each environment defines single-instance pure functions and
`BatchedJaxEnv` vmaps them, so a 4096-wide bandit batch is one fused XLA
program.
"""
from __future__ import annotations

import enum
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from agents_tpu.bandits.environments.bandit_envs import BanditJaxEnvironment
from agents_tpu.bandits.specs.bandit_spec_utils import (
    GLOBAL_FEATURE_KEY, NUM_ACTIONS_FEATURE_KEY, PER_ARM_FEATURE_KEY)
from agents_tpu.specs import array_spec


class StationaryStochasticPerArmBandit(BanditJaxEnvironment):
  """Global + per-arm features; reward on the chosen arm's features.

  Mirrors stationary_stochastic_per_arm_py_environment.py:33: observation
  = {global: [g], per_arm: [K, a]} (+ optional num_actions for variable
  arm counts), reward = reward_fn(concat(global, per_arm[action]), key).

  `expected_reward_fn` (noise-free) powers optimal_reward_fn /
  optimal_action_fn for the regret metrics; arms beyond num_actions are
  masked out of the optimum.
  """

  def __init__(self,
               global_sampling_fn: Callable,
               arm_sampling_fn: Callable,
               reward_fn: Callable,
               global_dim: int,
               arm_dim: int,
               max_num_actions: int,
               num_actions_fn: Optional[Callable] = None,
               expected_reward_fn: Optional[Callable] = None):
    self.global_sampling_fn = global_sampling_fn
    self.arm_sampling_fn = arm_sampling_fn
    self.reward_fn = reward_fn
    self.global_dim = global_dim
    self.arm_dim = arm_dim
    self.max_num_actions = max_num_actions
    self.num_actions_fn = num_actions_fn
    self.expected_reward_fn = expected_reward_fn

  def observation_spec(self):
    spec = {
        GLOBAL_FEATURE_KEY:
            array_spec.ArraySpec((self.global_dim,), np.float32, "global"),
        PER_ARM_FEATURE_KEY:
            array_spec.ArraySpec((self.max_num_actions, self.arm_dim),
                                 np.float32, "per_arm"),
    }
    if self.num_actions_fn is not None:
      spec[NUM_ACTIONS_FEATURE_KEY] = array_spec.BoundedArraySpec(
          (), np.int32, 1, self.max_num_actions, "num_actions")
    return spec

  def action_spec(self):
    return array_spec.BoundedArraySpec((), np.int32, 0,
                                       self.max_num_actions - 1, "action")

  def _sample_context(self, key, round_):
    k_g, k_a, k_n = jax.random.split(key, 3)
    arm_keys = jax.random.split(k_a, self.max_num_actions)
    obs = {
        GLOBAL_FEATURE_KEY: self.global_sampling_fn(k_g),
        PER_ARM_FEATURE_KEY: jax.vmap(self.arm_sampling_fn)(arm_keys),
    }
    if self.num_actions_fn is not None:
      n = jnp.clip(self.num_actions_fn(k_n), 1, self.max_num_actions)
      obs[NUM_ACTIONS_FEATURE_KEY] = n.astype(jnp.int32)
    return obs

  def _reward(self, context, action, key, round_):
    x = jnp.concatenate([context[GLOBAL_FEATURE_KEY],
                         context[PER_ARM_FEATURE_KEY][action]])
    return self.reward_fn(x, key)

  def _expected_all_arms(self, observation):
    g = observation[GLOBAL_FEATURE_KEY]
    arms = observation[PER_ARM_FEATURE_KEY]
    x = jnp.concatenate(
        [jnp.broadcast_to(g[..., None, :], arms.shape[:-1] + g.shape[-1:]),
         arms], axis=-1)
    vals = self.expected_reward_fn(x)
    if NUM_ACTIONS_FEATURE_KEY in observation:
      k = jnp.arange(arms.shape[-2])
      valid = k < observation[NUM_ACTIONS_FEATURE_KEY][..., None]
      vals = jnp.where(valid, vals, -jnp.inf)
    return vals

  def optimal_reward_fn(self, observation):
    if self.expected_reward_fn is None:
      raise NotImplementedError
    return jnp.max(self._expected_all_arms(observation), axis=-1)

  def optimal_action_fn(self, observation):
    if self.expected_reward_fn is None:
      raise NotImplementedError
    return jnp.argmax(self._expected_all_arms(observation), axis=-1)


class BernoulliActionMaskBandit(BanditJaxEnvironment):
  """Adds a per-round Bernoulli feasibility mask to any bandit env.

  Mirrors bernoulli_action_mask_tf_environment.py:72: observation becomes
  `join_fn(context, mask)` (default: a (context, mask) tuple), mask[k] ~
  Bernoulli(action_probability); rounds whose mask is all-zero get one
  uniformly random action enabled (reference `_maybe_add_one_action`:58).
  """

  def __init__(self, env: BanditJaxEnvironment,
               action_probability: float = 0.5,
               join_fn: Optional[Callable] = None):
    self.env = env
    self.action_probability = action_probability
    self.join_fn = join_fn or (lambda context, mask: (context, mask))
    aspec = env.action_spec()
    self.num_actions = int(aspec.maximum) - int(aspec.minimum) + 1

  def observation_spec(self):
    mask_spec = array_spec.BoundedArraySpec((self.num_actions,), np.int32,
                                            0, 1, "mask")
    return self.join_fn(self.env.observation_spec(), mask_spec)

  def action_spec(self):
    return self.env.action_spec()

  def _sample_context(self, key, round_):
    k_ctx, k_mask, k_fix = jax.random.split(key, 3)
    context = self.env._sample_context(k_ctx, round_)
    mask = jax.random.bernoulli(
        k_mask, self.action_probability, (self.num_actions,))
    # All-zero masks get one random action enabled.
    extra = jax.nn.one_hot(
        jax.random.randint(k_fix, (), 0, self.num_actions),
        self.num_actions, dtype=bool)
    mask = jnp.where(jnp.any(mask), mask, extra)
    return self.join_fn(context, mask.astype(jnp.int32))

  def _reward(self, context, action, key, round_):
    # join_fn may be arbitrary; recover the inner context by convention:
    # for the default tuple join it is element 0. Custom joins must keep
    # the inner context as the first leaf group, as here.
    inner = context[0] if isinstance(context, tuple) else context
    return self.env._reward(inner, action, key, round_)

  def optimal_reward_fn(self, observation):
    """Best expected reward over FEASIBLE arms. Comparing regret against
    masked-out arms would give even an oracle policy a positive regret
    floor whenever the globally-best arm is infeasible."""
    if (isinstance(observation, tuple)
        and hasattr(self.env, "expected_rewards")):
      inner, mask = observation[0], observation[1]
      er = self.env.expected_rewards(inner)
      return jnp.max(jnp.where(mask.astype(bool), er, -jnp.inf), axis=-1)
    inner = (observation[0]
             if isinstance(observation, tuple) else observation)
    return self.env.optimal_reward_fn(inner)  # upper bound (no mask info)

  def optimal_action_fn(self, observation):
    if (isinstance(observation, tuple)
        and hasattr(self.env, "expected_rewards")):
      inner, mask = observation[0], observation[1]
      er = self.env.expected_rewards(inner)
      return jnp.argmax(jnp.where(mask.astype(bool), er, -jnp.inf), axis=-1)
    inner = (observation[0]
             if isinstance(observation, tuple) else observation)
    return self.env.optimal_action_fn(inner)


class FeedbackModel(enum.IntEnum):
  """ranking_environment.py:52 — shape of the per-round feedback."""
  CASCADING = 1      # dict {chosen_index, chosen_value}
  SCORE_VECTOR = 2   # [num_slots] vector, click value at the chosen slot


class ClickModel(enum.IntEnum):
  """ranking_environment.py:64 — how the modelled user picks an item."""
  GHOST_ACTIONS = 1    # unit-vector ghost items soak up no-clicks
  DISTANCE_BASED = 2   # no click if no score clears a threshold


class RankingBanditEnv(BanditJaxEnvironment):
  """Slate-ranking environment with per-arm features.

  Mirrors ranking_environment.py:78: each round samples a global context
  and `num_items` item features; the agent returns an ordered slate of
  `num_slots` item indices; a user model scores slotted items with the
  bilinear form itemᵀ W global and clicks (or doesn't). Feedback is either
  CASCADING ({chosen_index, chosen_value}) or a SCORE_VECTOR of length
  num_slots (reference `_cascading_to_scorevector`:242).
  """

  def __init__(self,
               global_sampling_fn: Callable,
               item_sampling_fn: Callable,
               num_items: int,
               num_slots: int,
               scores_weight_matrix,
               global_dim: int,
               item_dim: int,
               feedback_model: FeedbackModel = FeedbackModel.SCORE_VECTOR,
               click_model: ClickModel = ClickModel.GHOST_ACTIONS,
               distance_threshold: float = 10.0,
               real_cascade: bool = False):
    self.global_sampling_fn = global_sampling_fn
    self.item_sampling_fn = item_sampling_fn
    self.num_items = num_items
    self.num_slots = num_slots
    self.W = jnp.asarray(scores_weight_matrix, jnp.float32)  # [item, global]
    self.global_dim = global_dim
    self.item_dim = item_dim
    self.feedback_model = feedback_model
    self.click_model = click_model
    self.distance_threshold = distance_threshold
    self.real_cascade = real_cascade

  def observation_spec(self):
    return {
        GLOBAL_FEATURE_KEY:
            array_spec.ArraySpec((self.global_dim,), np.float32, "global"),
        PER_ARM_FEATURE_KEY:
            array_spec.ArraySpec((self.num_items, self.item_dim), np.float32,
                                 "per_arm"),
    }

  def action_spec(self):
    return array_spec.BoundedArraySpec((self.num_slots,), np.int32, 0,
                                       self.num_items - 1, "action")

  def reward_spec(self):
    if self.feedback_model == FeedbackModel.CASCADING:
      return {
          "chosen_index": array_spec.ArraySpec((), np.float32,
                                                "chosen_index"),
          "chosen_value": array_spec.ArraySpec((), np.float32,
                                               "chosen_value"),
      }
    return array_spec.ArraySpec((self.num_slots,), np.float32, "reward")

  def _sample_context(self, key, round_):
    k_g, k_i = jax.random.split(key)
    item_keys = jax.random.split(k_i, self.num_items)
    return {
        GLOBAL_FEATURE_KEY: self.global_sampling_fn(k_g),
        PER_ARM_FEATURE_KEY: jax.vmap(self.item_sampling_fn)(item_keys),
    }

  def _scores(self, global_obs, items):
    # itemᵀ W global for each item (ranking_environment.py:264).
    return (items @ self.W) @ global_obs

  def _choose_ghost_actions(self, global_obs, slotted, key):
    """Slotted items compete with unit-vector ghosts; a ghost pick is a
    no-click (ranking_environment.py:275-302)."""
    with_units = jnp.concatenate(
        [slotted, jnp.eye(self.item_dim, dtype=slotted.dtype)], axis=0)
    k_perturb, k_choice = jax.random.split(key)
    scores = self._scores(global_obs, with_units)
    perturbed = scores + jax.random.normal(k_perturb, scores.shape)
    probs = jax.nn.sigmoid(perturbed)
    probs = probs / jnp.sum(probs)
    choice = jax.random.categorical(k_choice, jnp.log(probs))
    return jnp.minimum(choice, self.num_slots)

  def _choose_distance_based(self, global_obs, slotted, key):
    del key
    scores = self._scores(global_obs, slotted)        # [num_slots]
    if self.real_cascade:
      # First slot clearing the threshold; num_slots if none does
      # (ranking_environment.py:303-314).
      hits = jnp.concatenate(
          [scores >= self.distance_threshold, jnp.array([True])])
      return jnp.argmax(hits)
    padded = jnp.concatenate(
        [scores, jnp.array([self.distance_threshold], scores.dtype)])
    return jnp.argmax(padded)

  def _reward(self, context, action, key, round_):
    global_obs = context[GLOBAL_FEATURE_KEY]
    slotted = context[PER_ARM_FEATURE_KEY][action]    # [num_slots, item_dim]
    if self.click_model == ClickModel.GHOST_ACTIONS:
      chosen = self._choose_ghost_actions(global_obs, slotted, key)
    else:
      chosen = self._choose_distance_based(global_obs, slotted, key)
    clicked = (chosen < self.num_slots).astype(jnp.float32)
    if self.feedback_model == FeedbackModel.CASCADING:
      return {"chosen_index": chosen.astype(jnp.float32),
              "chosen_value": clicked}
    # Score vector: click value in the chosen slot, zeros elsewhere; the
    # no-click column is dropped (ranking_environment.py:242-247).
    vec = jax.nn.one_hot(chosen, self.num_slots + 1) * clicked
    return vec[:-1]


def cascading_to_score_vector(chosen_index, chosen_value, num_slots: int):
  """Converts CASCADING feedback to a [.., num_slots] score vector
  (ranking_environment.py:242)."""
  idx = chosen_index.astype(jnp.int32)
  vec = jax.nn.one_hot(idx, num_slots + 1) * chosen_value[..., None]
  return vec[..., :-1]


class ExplicitPositionalBiasRankingEnv(BanditJaxEnvironment):
  """Ranking env with an explicit per-slot observation probability.

  Mirrors ranking_environment.py:316
  (ExplicitPositionalBiasRankingEnvironment): a slotted item is clicked
  iff it is observed (Bernoulli(observation_probs[slot]), independent of
  content) AND relevant (Bernoulli(relevance_fn(global, item)), clipped
  to [0, 1]) — so several slots can be clicked in one round. Feedback is
  always a [num_slots] score vector.
  """

  def __init__(self, global_sampling_fn: Callable,
               item_sampling_fn: Callable, relevance_fn: Callable,
               num_items: int, observation_probs,
               global_dim: int, item_dim: int):
    self.global_sampling_fn = global_sampling_fn
    self.item_sampling_fn = item_sampling_fn
    self.relevance_fn = relevance_fn
    self.num_items = num_items
    probs = np.asarray(observation_probs, np.float32)
    if np.any(probs < 0.0) or np.any(probs > 1.0):
      raise ValueError("Observation probabilities need to be in [0, 1].")
    self.observation_probs = jnp.asarray(probs)
    self.num_slots = len(probs)
    self.global_dim = global_dim
    self.item_dim = item_dim

  def observation_spec(self):
    return {
        GLOBAL_FEATURE_KEY:
            array_spec.ArraySpec((self.global_dim,), np.float32, "global"),
        PER_ARM_FEATURE_KEY:
            array_spec.ArraySpec((self.num_items, self.item_dim), np.float32,
                                 "per_arm"),
    }

  def action_spec(self):
    return array_spec.BoundedArraySpec((self.num_slots,), np.int32, 0,
                                       self.num_items - 1, "action")

  def reward_spec(self):
    return array_spec.ArraySpec((self.num_slots,), np.float32,
                                "score_vector")

  def _sample_context(self, key, round_):
    k_g, k_i = jax.random.split(key)
    item_keys = jax.random.split(k_i, self.num_items)
    return {
        GLOBAL_FEATURE_KEY: self.global_sampling_fn(k_g),
        PER_ARM_FEATURE_KEY: jax.vmap(self.item_sampling_fn)(item_keys),
    }

  def _reward(self, context, action, key, round_):
    global_obs = context[GLOBAL_FEATURE_KEY]
    slotted = context[PER_ARM_FEATURE_KEY][action]   # [num_slots, item_dim]
    relevances = jnp.clip(
        jax.vmap(lambda item: self.relevance_fn(global_obs, item))(slotted),
        0.0, 1.0)
    click_probs = relevances * self.observation_probs
    return jax.random.bernoulli(key, click_probs).astype(jnp.float32)
