"""PPO (clip variant + optional KL penalty).

Analogue of ``tf_agents/agents/ppo/ppo_agent.py:114`` /
``ppo_clip_agent.py:233``:
  - GAE + TD-lambda returns (`compute_return_and_advantage` :617-720)
    computed with collect-time value predictions, via the O(log T)
    associative scans in utils.value_ops
  - epoch loop over the same rollout (`_train` :834, :925), here a
    lax.scan over epochs x shuffled minibatches — the whole multi-epoch
    update is ONE device program
  - losses: clipped policy-gradient (:1329), value estimation with
    optional value clipping (:1203), entropy regularization (:1159),
    KL cutoff + adaptive KL penalty (:1514,:1541) with beta update
    (`update_adaptive_kl_beta` :1632)
  - streaming observation/reward normalizers (utils/tensor_normalizer)
  - advantage normalization (:966)

Experience: Trajectory [B, T] whose policy_info carries the collect-time
distribution object and value predictions (see ppo_policy.py).
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
from agents_tpu.agents.ppo.ppo_policy import PPOPolicy
from agents_tpu.policies.wrappers import GreedyPolicy
from agents_tpu.trajectories import time_step as ts
from agents_tpu.utils import common, value_ops
from agents_tpu.utils.common import LossInfo
from agents_tpu.utils.tensor_normalizer import StreamingTensorNormalizer


@struct.dataclass
class PPOAgentState:
  actor_params: Any
  value_params: Any
  opt_state: Any
  obs_norm_state: Any
  reward_norm_state: Any
  kl_beta: jax.Array
  train_step: jax.Array


@struct.dataclass
class PPOLossExtra:
  policy_gradient_loss: jax.Array
  value_estimation_loss: jax.Array
  entropy_reg_loss: jax.Array
  kl_penalty_loss: jax.Array
  clip_fraction: jax.Array


class PPOAgent(Agent):

  def __init__(self, time_step_spec, action_spec, optimizer, actor_network,
               value_network,
               importance_ratio_clipping: float = 0.2,
               discount_factor: float = 0.99,
               lambda_value: float = 0.95,
               num_epochs: int = 10,
               num_minibatches: int = 1,
               num_minibatch_shards: int = 1,
               entropy_regularization: float = 0.0,
               value_pred_loss_coef: float = 0.5,
               use_gae: bool = True,
               use_td_lambda_return: bool = True,
               normalize_observations: bool = True,
               normalize_rewards: bool = True,
               normalize_advantages: bool = True,
               reward_norm_clipping: float = 10.0,
               value_clipping: Optional[float] = None,
               initial_adaptive_kl_beta: float = 0.0,
               adaptive_kl_target: float = 0.01,
               adaptive_kl_tolerance: float = 0.3,
               kl_cutoff_factor: float = 0.0,
               kl_cutoff_coef: float = 1000.0,
               gradient_clipping: Optional[float] = None):
    self.time_step_spec = time_step_spec
    self.action_spec = action_spec
    self.optimizer = optimizer
    self.actor_network = actor_network
    self.value_network = value_network
    self.importance_ratio_clipping = importance_ratio_clipping
    self.gamma = discount_factor
    self.lambda_value = lambda_value
    self.num_epochs = num_epochs
    self.num_minibatches = num_minibatches
    # DP meshes: a global B*T permutation makes GSPMD all-gather the
    # whole rollout every epoch. With num_minibatch_shards = the 'data'
    # axis size, shuffling is per-shard (batched take_along_axis — the
    # operand/indices share the sharded batch dim, which the partitioner
    # handles with zero collectives) and every minibatch draws equally
    # from every shard — the standard per-worker minibatching of
    # distributed PPO.
    self.num_minibatch_shards = num_minibatch_shards
    self.entropy_regularization = entropy_regularization
    self.value_pred_loss_coef = value_pred_loss_coef
    self.use_gae = use_gae
    self.use_td_lambda_return = use_td_lambda_return
    self.normalize_advantages = normalize_advantages
    self.reward_norm_clipping = reward_norm_clipping
    self.value_clipping = value_clipping
    self.initial_adaptive_kl_beta = initial_adaptive_kl_beta
    self.adaptive_kl_target = adaptive_kl_target
    self.adaptive_kl_tolerance = adaptive_kl_tolerance
    self.kl_cutoff_factor = kl_cutoff_factor
    self.kl_cutoff_coef = kl_cutoff_coef
    self.gradient_clipping = gradient_clipping
    self.train_sequence_length = None  # full [B, T] rollouts
    # Recurrent nets train on whole sequences: minibatches partition the
    # batch axis only, time stays intact so the LSTM unrolls from zero
    # state with FIRST-step reset masking (the reference PPOLearner
    # likewise keeps episodes whole for RNN training and only shuffles
    # across sequences, train/ppo_learner.py:270-310).
    self._recurrent = bool(actor_network.state_spec) or bool(
        value_network.state_spec)

    self.obs_normalizer = (
        StreamingTensorNormalizer(time_step_spec.observation)
        if normalize_observations else None)
    self.reward_normalizer = (
        StreamingTensorNormalizer(time_step_spec.reward)
        if normalize_rewards else None)

    self.collect_policy = PPOPolicy(
        time_step_spec, action_spec, actor_network, value_network,
        observation_normalizer=self.obs_normalizer)
    self.policy = GreedyPolicy(self.collect_policy)

  # -- lifecycle -----------------------------------------------------------
  def init(self, key) -> PPOAgentState:
    k_a, k_v = jax.random.split(key)
    actor_params = self.actor_network.init_params(k_a)
    value_params = self.value_network.init_params(k_v)
    return PPOAgentState(
        actor_params=actor_params,
        value_params=value_params,
        opt_state=self.optimizer.init((actor_params, value_params)),
        obs_norm_state=(self.obs_normalizer.init()
                        if self.obs_normalizer else ()),
        reward_norm_state=(self.reward_normalizer.init()
                           if self.reward_normalizer else ()),
        kl_beta=jnp.asarray(self.initial_adaptive_kl_beta, jnp.float32),
        train_step=jnp.zeros((), jnp.int32),
    )

  def policy_params(self, agent_state):
    return {
        "actor": agent_state.actor_params,
        "value": agent_state.value_params,
        "normalizer": agent_state.obs_norm_state,
    }

  # -- advantages ------------------------------------------------------------
  def compute_return_and_advantage(self, agent_state, experience):
    """reference ppo_agent.py:617-720; batch-major [B, T] frames.

    Uses frames [:, :-1] as the training window and frame T-1's value
    prediction as the bootstrap.
    """
    rewards = experience.reward[:, :-1]
    if self.reward_normalizer is not None:
      # Normalize rewards WITHOUT centering (reference :660).
      rewards = self.reward_normalizer.normalize(
          agent_state.reward_norm_state, rewards,
          clip_value=self.reward_norm_clipping, center_mean=False)
    discounts = self.gamma * experience.discount[:, :-1]
    # Zero the discount at episode-final transitions (reference
    # get_episode_mask at ppo_agent.py:672): a TIME-LIMIT boundary keeps
    # discount 1 (truncation bootstraps in TD settings), but the
    # GAE/return recursion must still restart there — otherwise the next
    # episode's values and reset rewards chain into every advantage of
    # the truncated episode.
    episode_mask = (experience.next_step_type[:, :-1] !=
                    ts.StepType.LAST).astype(discounts.dtype)
    discounts = discounts * episode_mask
    value_preds = experience.policy_info["value_prediction"]  # [B, T]

    values_tm = jnp.swapaxes(value_preds[:, :-1], 0, 1)
    final_value = value_preds[:, -1]
    rewards_tm = jnp.swapaxes(rewards, 0, 1)
    discounts_tm = jnp.swapaxes(discounts, 0, 1)

    if self.use_gae:
      advantages = value_ops.generalized_advantage_estimation(
          values_tm, final_value, discounts_tm, rewards_tm,
          td_lambda=self.lambda_value)
      advantages = jnp.swapaxes(advantages, 0, 1)  # [B, T-1]
      if self.use_td_lambda_return:
        returns = advantages + value_preds[:, :-1]
      else:
        returns = jnp.swapaxes(
            value_ops.discounted_return(rewards_tm, discounts_tm,
                                        final_value=final_value), 0, 1)
    else:
      returns = jnp.swapaxes(
          value_ops.discounted_return(rewards_tm, discounts_tm,
                                      final_value=final_value), 0, 1)
      advantages = returns - value_preds[:, :-1]
    return returns, advantages

  # -- loss over one (mini)batch of frames -----------------------------------
  def _loss(self, params, agent_state, batch):
    actor_params, value_params = params
    obs, step_type, actions, old_dist, old_values, returns, advantages, \
        old_log_prob, mask = batch

    if self.obs_normalizer is not None:
      obs = self.obs_normalizer.normalize(agent_state.obs_norm_state, obs)
    dist, _ = self.actor_network.apply(actor_params, obs, step_type, ())
    values, _ = self.value_network.apply(value_params, obs, step_type, ())

    new_log_prob = common.log_probability(dist, actions)
    ratio = jnp.exp(new_log_prob - old_log_prob)
    if self.importance_ratio_clipping > 0.0:
      clipped_ratio = jnp.clip(ratio, 1.0 - self.importance_ratio_clipping,
                               1.0 + self.importance_ratio_clipping)
      pg_per_example = -jnp.minimum(ratio * advantages,
                                    clipped_ratio * advantages)
    else:
      # No clipping (the KL-penalty variant): plain surrogate, reference
      # ppo_agent.py:1398-1401 branches the same way — min() with an
      # unclipped "clipped_ratio"=1 would wrongly zero the gradient for
      # ~half the samples (adv>0 & ratio>1, adv<0 & ratio<1).
      pg_per_example = -ratio * advantages
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    pg_loss = jnp.sum(pg_per_example * mask) / denom
    clip_fraction = jnp.sum(
        (jnp.abs(ratio - 1.0) > self.importance_ratio_clipping) * mask
    ) / denom

    value_error = returns - values
    if self.value_clipping is not None:
      # reference :1240: clip value predictions around collect-time values.
      clipped_values = old_values + jnp.clip(
          values - old_values, -self.value_clipping, self.value_clipping)
      value_error = jnp.maximum(jnp.square(returns - values),
                                jnp.square(returns - clipped_values))
    else:
      value_error = jnp.square(value_error)
    value_loss = self.value_pred_loss_coef * jnp.sum(
        value_error * mask) / denom

    entropy_loss = jnp.zeros(())
    if self.entropy_regularization > 0:
      entropy = common.entropy(dist)
      entropy_loss = -self.entropy_regularization * jnp.sum(
          entropy * mask) / denom

    kl_penalty = jnp.zeros(())
    kl = jax.tree_util.tree_map(
        lambda o, n: o.kl_divergence(n), old_dist, dist,
        is_leaf=lambda d: hasattr(d, "kl_divergence"))
    kl = sum(jax.tree_util.tree_leaves(kl))
    mean_kl = jnp.sum(kl * mask) / denom
    if self.kl_cutoff_factor > 0:
      cutoff = self.kl_cutoff_factor * self.adaptive_kl_target
      kl_penalty = kl_penalty + self.kl_cutoff_coef * jnp.sum(
          jnp.square(jnp.maximum(kl - cutoff, 0.0)) * mask) / denom
    kl_penalty = kl_penalty + agent_state.kl_beta * mean_kl

    total = pg_loss + value_loss + entropy_loss + kl_penalty
    extra = PPOLossExtra(
        policy_gradient_loss=pg_loss, value_estimation_loss=value_loss,
        entropy_reg_loss=entropy_loss, kl_penalty_loss=kl_penalty,
        clip_fraction=clip_fraction)
    return total, (extra, mean_kl)

  # -- train -----------------------------------------------------------------
  def train(self, agent_state: PPOAgentState, experience, weights=None,
            key: Optional[jax.Array] = None) -> Tuple[PPOAgentState, LossInfo]:
    """experience: Trajectory [B, T] from the PPO collect policy."""
    if key is None:
      key = jax.random.fold_in(jax.random.key(31), agent_state.train_step)

    # 1) Update normalizers from the fresh rollout (reference PPOLearner
    #    drains the normalization stream first, train/ppo_learner.py:310).
    if self.obs_normalizer is not None:
      agent_state = agent_state.replace(
          obs_norm_state=self.obs_normalizer.update(
              agent_state.obs_norm_state, experience.observation))
    if self.reward_normalizer is not None:
      agent_state = agent_state.replace(
          reward_norm_state=self.reward_normalizer.update(
              agent_state.reward_norm_state, experience.reward))

    # 2) Advantages/returns from collect-time values.
    returns, advantages = self.compute_return_and_advantage(
        agent_state, experience)

    # 3) Frame window [:, :-1]. Feed-forward nets flatten to one frame
    #    axis [B*(T-1), ...] (the clip loss is per-frame; the reference
    #    learner also shuffles at transition granularity). Recurrent nets
    #    keep [B, T-1] sequences whole. Mask drops boundary frames
    #    (ppo_utils.make_timestep_mask).
    B = experience.discount.shape[0]
    Tm1 = experience.discount.shape[1] - 1
    if self._recurrent:
      window = lambda x: jax.tree_util.tree_map(lambda t: t[:, :-1], x)
    else:
      window = lambda x: jax.tree_util.tree_map(
          lambda t: t[:, :-1].reshape((B * Tm1,) + t.shape[2:]), x)
      returns = returns.reshape(B * Tm1)
      advantages = advantages.reshape(B * Tm1)
    obs = window(experience.observation)
    step_type = window(experience.step_type)
    actions = window(experience.action)
    old_dist = window(experience.policy_info["dist"])
    old_values = window(experience.policy_info["value_prediction"])
    mask = (step_type != ts.StepType.LAST).astype(jnp.float32)
    if weights is not None:
      w = jnp.broadcast_to(weights[:, None], (B, Tm1))
      mask = mask * (w if self._recurrent else w.reshape(-1))

    old_log_prob = common.log_probability(old_dist, actions)
    old_log_prob = jax.lax.stop_gradient(old_log_prob)

    if self.normalize_advantages:
      denom = jnp.maximum(jnp.sum(mask), 1.0)
      adv_mean = jnp.sum(advantages * mask) / denom
      adv_var = jnp.sum(jnp.square(advantages - adv_mean) * mask) / denom
      advantages = (advantages - adv_mean) / (jnp.sqrt(adv_var) + 1e-8)

    n_items = mask.shape[0]  # sequences when recurrent, frames otherwise
    n_mb = self.num_minibatches
    params = (agent_state.actor_params, agent_state.value_params)
    opt_state = agent_state.opt_state

    flat_batch = (obs, step_type, actions, old_dist, old_values, returns,
                  advantages, old_log_prob, mask)

    n_sh = self.num_minibatch_shards
    if n_sh > 1 and (n_items % n_sh or
                     (n_items // n_sh) % max(n_mb, 1)):
      raise ValueError(
          f"items {n_items} not divisible by num_minibatch_shards {n_sh} "
          f"x num_minibatches {n_mb}")
    # Flat items are B-major, so shard blocks of n_items/n_sh only line up
    # with the device sharding of the batch axis when B itself splits
    # evenly across shards; a misaligned config would silently reintroduce
    # the cross-shard gathers this feature exists to avoid.
    if n_sh > 1 and B % n_sh:
      raise ValueError(
          f"experience batch {B} not divisible by num_minibatch_shards "
          f"{n_sh}; set num_minibatch_shards to a divisor of the rollout "
          "batch (normally the 'data' mesh-axis size)")

    def epoch_body(carry, epoch_key):
      params, opt_state = carry
      if n_sh > 1:
        # Shard-local shuffle: [n_sh, per] batched gather along axis 1.
        per = n_items // n_sh
        local = jax.vmap(
            lambda k: jax.random.permutation(k, per))(
                jax.random.split(epoch_key, n_sh))        # [n_sh, per]

        def shard_shuffle(x):
          blocked = x.reshape((n_sh, per) + x.shape[1:])
          idx = local.reshape((n_sh, per) + (1,) * (blocked.ndim - 2))
          return jnp.take_along_axis(blocked, idx, axis=1)

        shuffled = jax.tree_util.tree_map(shard_shuffle, flat_batch)
      else:
        perm = jax.random.permutation(epoch_key, n_items)
        shuffled = jax.tree_util.tree_map(lambda x: x[perm], flat_batch)

      def mb_body(carry, mb):
        params, opt_state = carry
        (loss, (extra, mean_kl)), grads = jax.value_and_grad(
            self._loss, has_aux=True)(params, agent_state, mb)
        if self.gradient_clipping is not None:
          grads = common.clip_gradient_norms(grads, self.gradient_clipping)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), (loss, extra, mean_kl)

      if n_sh > 1:
        per = n_items // n_sh
        if n_mb > 1:
          k_ = per // n_mb

          def to_mbs(x):
            # [n_sh, per, ...] -> [n_mb, n_sh*k_, ...]: minibatch m takes
            # k_ items from EVERY shard (stratified), staying sharded.
            y = x.reshape((n_sh, n_mb, k_) + x.shape[2:])
            y = jnp.moveaxis(y, 1, 0)
            return y.reshape((n_mb, n_sh * k_) + x.shape[2:])

          mbs = jax.tree_util.tree_map(to_mbs, shuffled)
          (params, opt_state), outs = jax.lax.scan(
              mb_body, (params, opt_state), mbs)
          outs = jax.tree_util.tree_map(lambda x: x[-1], outs)
        else:
          flat = jax.tree_util.tree_map(
              lambda x: x.reshape((n_items,) + x.shape[2:]), shuffled)
          (params, opt_state), outs = mb_body((params, opt_state), flat)
      elif n_mb > 1:
        mbs = jax.tree_util.tree_map(
            lambda x: x.reshape((n_mb, n_items // n_mb) + x.shape[1:]),
            shuffled)
        (params, opt_state), outs = jax.lax.scan(
            mb_body, (params, opt_state), mbs)
        outs = jax.tree_util.tree_map(lambda x: x[-1], outs)
      else:
        (params, opt_state), outs = mb_body((params, opt_state), shuffled)
      return (params, opt_state), outs

    epoch_keys = jax.random.split(key, self.num_epochs)
    (params, opt_state), outs = jax.lax.scan(
        epoch_body, (params, opt_state), epoch_keys)
    loss, extra, mean_kl = jax.tree_util.tree_map(lambda x: x[-1], outs)
    actor_params, value_params = params

    # 4) Adaptive KL beta update (reference :1632) — from the KL of the
    # FULL batch under the FINAL policy (reference :978-989 recomputes
    # after the epoch loop), NOT the last minibatch of the last epoch:
    # with num_minibatches > 1 a single outlier minibatch would
    # random-walk beta by 1.5x on sampling noise.
    kl_beta = agent_state.kl_beta
    if self.initial_adaptive_kl_beta > 0:
      obs_f, st_f, _, old_dist_f, _, _, _, _, mask_f = flat_batch
      obs_n = (self.obs_normalizer.normalize(agent_state.obs_norm_state,
                                             obs_f)
               if self.obs_normalizer is not None else obs_f)
      dist_f, _ = self.actor_network.apply(actor_params, obs_n, st_f, ())
      kl_f = jax.tree_util.tree_map(
          lambda o, n: o.kl_divergence(n), old_dist_f, dist_f,
          is_leaf=lambda d: hasattr(d, "kl_divergence"))
      kl_f = sum(jax.tree_util.tree_leaves(kl_f))
      denom_f = jnp.maximum(jnp.sum(mask_f), 1.0)
      mean_kl = jnp.sum(kl_f * mask_f) / denom_f
      too_high = mean_kl > self.adaptive_kl_target * (
          1.0 + self.adaptive_kl_tolerance)
      too_low = mean_kl < self.adaptive_kl_target * (
          1.0 - self.adaptive_kl_tolerance)
      kl_beta = jnp.where(too_high, kl_beta * 1.5,
                          jnp.where(too_low, kl_beta / 1.5, kl_beta))

    new_state = agent_state.replace(
        actor_params=actor_params, value_params=value_params,
        opt_state=opt_state, kl_beta=kl_beta,
        train_step=agent_state.train_step + 1)
    return new_state, LossInfo(loss=loss, extra=extra)
