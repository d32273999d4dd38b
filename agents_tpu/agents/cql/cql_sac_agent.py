"""CQL-SAC (offline RL).

Analogue of ``tf_agents/agents/cql/cql_sac_agent.py:55``: SAC plus the
conservative Q-learning regularizer

  E_s[ log sum exp Q(s, a') - E_{a~D} Q(s, a) ]

with `num_cql_samples` action samples drawn from both a uniform
distribution and the current policy, importance-weighted per Kumar'20
Appendix F (reference ``_cql_loss``, cql_sac_agent.py:540-680). Full
reference surface:

  - ``use_lagrange_cql_alpha`` / ``cql_tau`` / ``cql_alpha_learning_rate``:
    CQL-Lagrange(H) — ``log_cql_alpha`` is trained with loss
    ``-cql_alpha * (cql_loss - tau)`` (reference :328-350, eq. 24).
  - ``include_critic_entropy_term``: optionally keep the SAC entropy
    bonus in the TD target (reference
    ``_critic_loss_with_optional_entropy_term``, :767).
  - ``reward_noise_variance``: Gaussian noise on rewards in the TD
    target (reference :838-846).
  - ``num_bc_steps``: behavioral-cloning actor warm-start — for the
    first N train steps the actor maximizes data-action log-prob instead
    of Q (reference ``actor_loss``, :682-735).
  - ``softmax_temperature`` and ``log_cql_alpha_clipping``
    (reference :94,:164).
  - ``bc_debug_mode``: critic trains on the CQL term alone (:290).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from agents_tpu.agents.sac.sac_agent import SacAgent, SacAgentState
from agents_tpu.trajectories import trajectory as tj
from agents_tpu.utils import common
from agents_tpu.utils.common import LossInfo


@struct.dataclass
class CqlSacAgentState(SacAgentState):
  log_cql_alpha: jax.Array = struct.field(default=None)
  cql_alpha_opt_state: Any = struct.field(default=None)


@struct.dataclass
class CqlSacLossExtra:
  critic_loss: jax.Array
  actor_loss: jax.Array
  alpha_loss: jax.Array
  cql_loss: jax.Array
  cql_alpha: jax.Array
  cql_alpha_loss: jax.Array


class CqlSacAgent(SacAgent):

  def __init__(self, *args, cql_alpha: float = 5.0,
               num_cql_samples: int = 10,
               include_critic_entropy_term: bool = False,
               use_lagrange_cql_alpha: bool = False,
               cql_alpha_learning_rate: float = 1e-4,
               cql_tau: float = 10.0,
               reward_noise_variance: float = 0.0,
               num_bc_steps: int = 0,
               softmax_temperature: float = 1.0,
               log_cql_alpha_clipping: Optional[Tuple[float, float]] = None,
               bc_debug_mode: bool = False,
               random_seed: int = 7, **kwargs):
    super().__init__(*args, **kwargs)
    if reward_noise_variance < 0:
      raise ValueError(
          f"reward_noise_variance must be >= 0, got {reward_noise_variance}")
    self.cql_alpha = cql_alpha
    self.num_cql_samples = num_cql_samples
    self.include_critic_entropy_term = include_critic_entropy_term
    self.use_lagrange_cql_alpha = use_lagrange_cql_alpha
    self.cql_tau = cql_tau
    self.reward_noise_variance = reward_noise_variance
    self.num_bc_steps = num_bc_steps
    self.softmax_temperature = softmax_temperature
    self.log_cql_alpha_clipping = log_cql_alpha_clipping
    self.bc_debug_mode = bc_debug_mode
    self.random_seed = random_seed
    self.cql_alpha_optimizer = optax.adam(cql_alpha_learning_rate)

  # -- lifecycle -------------------------------------------------------------
  def init(self, key) -> CqlSacAgentState:
    base = super().init(key)
    log_cql_alpha = jnp.asarray(np.log(self.cql_alpha), jnp.float32)
    return CqlSacAgentState(
        **{f: getattr(base, f) for f in base.__dataclass_fields__},
        log_cql_alpha=log_cql_alpha,
        cql_alpha_opt_state=self.cql_alpha_optimizer.init(log_cql_alpha))

  def _get_cql_alpha(self, agent_state) -> jax.Array:
    """Current CQL weight (reference ``_get_cql_alpha``, :752)."""
    if not self.use_lagrange_cql_alpha:
      return jnp.asarray(self.cql_alpha, jnp.float32)
    log_a = agent_state.log_cql_alpha
    if self.log_cql_alpha_clipping is not None:
      log_a = jnp.clip(log_a, self.log_cql_alpha_clipping[0],
                       self.log_cql_alpha_clipping[1])
    return jnp.exp(log_a)

  # -- losses ------------------------------------------------------------------
  def _cql_loss(self, critic_params, agent_state, time_steps, actions, key):
    """Importance-weighted log-sum-exp over sampled actions minus data Q
    (reference ``_cql_loss``, cql_sac_agent.py:540-680). Values match the
    reference exactly: no log(2N) normalizer is subtracted, temperatures
    scale Q inside the logsumexp, and the two critics' gaps are averaged.
    """
    c1, c2 = critic_params
    k_rand, k_pi = jax.random.split(key)
    n = self.num_cql_samples
    temp = self.softmax_temperature

    # Uniform action samples across the (single) bounded action spec.
    spec = jax.tree_util.tree_leaves(
        self.action_spec, is_leaf=lambda s: hasattr(s, "minimum"))[0]
    lo = jnp.asarray(spec.minimum, jnp.float32)
    hi = jnp.asarray(spec.maximum, jnp.float32)
    B = time_steps.step_type.shape[0]
    rand_actions = jax.random.uniform(
        k_rand, (n, B) + spec.shape, jnp.float32) * (hi - lo) + lo
    # Uniform density (1/range)^dim -> log prob = -sum(log range).
    log_u = jnp.sum(-jnp.log(hi - lo) * jnp.ones(spec.shape))

    # Policy samples at the same states (actor not updated here).
    def sample_pi(k):
      return self._sample_actions(agent_state.actor_params, time_steps, k)

    pi_actions, pi_lps = jax.vmap(sample_pi)(jax.random.split(k_pi, n))

    def q_batch(cp, acts):
      return jax.vmap(lambda a: self._q(cp, time_steps, a))(acts)  # [n, B]

    def one_critic(cp, q_data):
      # combined log-weights: Q*temp - log q(a) for each proposal.
      w_rand = q_batch(cp, rand_actions) * temp - log_u
      w_pi = q_batch(cp, pi_actions) * temp - pi_lps
      combined = jnp.concatenate([w_pi, w_rand], axis=0)   # [2n, B]
      lse = jax.scipy.special.logsumexp(combined, axis=0) / temp
      return jnp.mean(lse - q_data)

    q1_data = self._q(c1, time_steps, actions)
    q2_data = self._q(c2, time_steps, actions)
    return (one_critic(c1, q1_data) + one_critic(c2, q2_data)) / 2.0

  def critic_loss(self, critic_params, agent_state, time_steps, actions,
                  next_time_steps, key, weights=None):
    """SAC critic loss with an optional entropy term in the target and
    optional reward noise (reference
    ``_critic_loss_with_optional_entropy_term``, cql_sac_agent.py:767)."""
    c1, c2 = critic_params
    k_actions, k_noise = jax.random.split(key)
    next_actions, next_log_pi = self._sample_actions(
        agent_state.actor_params, next_time_steps, k_actions)
    target_q1 = self._q(agent_state.target_critic1_params, next_time_steps,
                        next_actions)
    target_q2 = self._q(agent_state.target_critic2_params, next_time_steps,
                        next_actions)
    target_value = jnp.minimum(target_q1, target_q2)
    if self.include_critic_entropy_term:
      target_value = target_value - \
          jnp.exp(agent_state.log_alpha) * next_log_pi

    reward = next_time_steps.reward
    if self.reward_noise_variance > 0:
      reward = reward + jax.random.normal(
          k_noise, reward.shape) * self.reward_noise_variance

    td_targets = jax.lax.stop_gradient(
        self.reward_scale_factor * reward
        + self.gamma * next_time_steps.discount * target_value)
    q1 = self._q(c1, time_steps, actions)
    q2 = self._q(c2, time_steps, actions)
    per_example = (self.td_errors_loss_fn(td_targets, q1)
                   + self.td_errors_loss_fn(td_targets, q2))
    valid_mask = (~time_steps.is_last()).astype(jnp.float32)
    return common.aggregate_losses(per_example_loss=per_example * valid_mask,
                                   sample_weight=weights)

  def actor_and_alpha_loss(self, actor_params, log_alpha, agent_state,
                           time_steps, key, weights=None, data_actions=None):
    """SAC actor/alpha loss, with the actor behaviorally cloning the data
    actions for the first ``num_bc_steps`` train steps (reference
    ``actor_loss``, cql_sac_agent.py:682-735)."""
    actions, log_pi = self._sample_actions(actor_params, time_steps, key)
    q1 = self._q(agent_state.critic1_params, time_steps, actions)
    q2 = self._q(agent_state.critic2_params, time_steps, actions)
    q = jnp.minimum(q1, q2)
    alpha = jnp.exp(log_alpha)
    sac_per_example = jax.lax.stop_gradient(alpha) * log_pi - q

    if self.num_bc_steps > 0 and data_actions is not None:
      data_log_prob = self._log_prob(actor_params, time_steps, data_actions)
      bc_per_example = jax.lax.stop_gradient(alpha) * log_pi - data_log_prob
      in_bc_phase = agent_state.train_step < self.num_bc_steps
      actor_per_example = jnp.where(in_bc_phase, bc_per_example,
                                    sac_per_example)
    else:
      actor_per_example = sac_per_example

    alpha_per_example = -log_alpha * jax.lax.stop_gradient(
        log_pi + self.target_entropy)
    actor_loss = common.aggregate_losses(
        per_example_loss=actor_per_example, sample_weight=weights)
    alpha_loss = common.aggregate_losses(
        per_example_loss=alpha_per_example, sample_weight=weights)
    return actor_loss + alpha_loss, (actor_loss, alpha_loss)

  def _log_prob(self, actor_params, time_steps, actions):
    """Actor-distribution log-prob of given actions, summed over leaves.

    Actions are clipped a small margin INTO the spec interior first:
    offline datasets contain actions saturated exactly at the bounds
    (noise-clipped collection, D4RL clipping), where the tanh-squashed
    log-prob diverges (measured -300+ at the boundary) and its gradient
    dominates the BC/CQL objective, wrecking the actor fit for the 97%
    of in-support actions. The reference's data path has the same
    boundary pathology handled by TFP's capped atanh; an explicit
    interior clip bounds it deterministically."""
    dist, _ = self.actor_network.apply(
        actor_params, time_steps.observation, time_steps.step_type, ())
    d_leaves = jax.tree_util.tree_leaves(
        dist, is_leaf=lambda d: hasattr(d, "log_prob"))
    a_leaves = jax.tree_util.tree_leaves(actions)
    s_leaves = jax.tree_util.tree_leaves(
        self.action_spec,
        is_leaf=lambda s: hasattr(s, "minimum") or hasattr(s, "shape"))

    def interior(a, spec):
      lo = getattr(spec, "minimum", None)
      hi = getattr(spec, "maximum", None)
      if lo is None or hi is None:
        return a
      lo = jnp.asarray(lo, a.dtype)
      hi = jnp.asarray(hi, a.dtype)
      margin = 1e-3 * (hi - lo)
      return jnp.clip(a, lo + margin, hi - margin)

    if not (len(d_leaves) == len(a_leaves) == len(s_leaves)):
      raise ValueError(
          "action-spec / distribution / action leaf counts disagree "
          f"({len(s_leaves)} specs, {len(d_leaves)} distributions, "
          f"{len(a_leaves)} actions) — e.g. one joint distribution over a "
          "nested action spec; clip-to-spec pairing would be wrong.")
    lp = d_leaves[0].log_prob(interior(a_leaves[0], s_leaves[0]))
    for d, a, s in zip(d_leaves[1:], a_leaves[1:], s_leaves[1:]):
      lp = lp + d.log_prob(interior(a, s))
    return lp

  # -- train -------------------------------------------------------------------
  def train(self, agent_state: CqlSacAgentState, experience, weights=None,
            key: Optional[jax.Array] = None
            ) -> Tuple[CqlSacAgentState, LossInfo]:
    if key is None:
      key = jax.random.fold_in(
          jax.random.key(self.random_seed), agent_state.train_step)
    k_sac, k_cql = jax.random.split(key)

    tj.check_adjacent_transition_sequence(experience, "CqlSacAgent")
    transition = tj.to_transition(experience)
    squeeze = lambda x: jax.tree_util.tree_map(lambda t: t[:, 0], x)
    time_steps = squeeze(transition.time_step)
    actions = squeeze(transition.action_step.action)
    next_time_steps = squeeze(transition.next_time_step)

    k_critic, k_actor = jax.random.split(k_sac)
    critic_params = (agent_state.critic1_params, agent_state.critic2_params)
    cql_alpha = self._get_cql_alpha(agent_state)

    def critic_total(cp):
      cql = self._cql_loss(cp, agent_state, time_steps, actions, k_cql)
      if self.bc_debug_mode:
        total = cql * cql_alpha
        base = jnp.zeros(())
      else:
        # TD term weighted by critic_loss_weight (reference
        # cql_sac_agent.py:284 `critic_loss *= self._critic_loss_weight`,
        # default 0.5): the critic optimizer sees the SUM of two
        # objectives, so the relative weight shapes the gradient — at
        # identical cql_alpha an unweighted TD term would halve the
        # conservatism.
        base = self.critic_loss_weight * self.critic_loss(
            cp, agent_state, time_steps, actions,
            next_time_steps, k_critic, weights)
        total = base + cql * cql_alpha
      return total, (base, cql)

    ((critic_loss, (_, cql_loss)), critic_grads) = jax.value_and_grad(
        critic_total, has_aux=True)(critic_params)
    if self.gradient_clipping is not None:
      critic_grads = common.clip_gradient_norms(critic_grads,
                                                self.gradient_clipping)
    cu, critic_opt_state = self.critic_optimizer.update(
        critic_grads, agent_state.critic_opt_state, critic_params)
    c1, c2 = optax.apply_updates(critic_params, cu)

    def _aa_loss(params):
      actor_params, log_alpha = params
      return self.actor_and_alpha_loss(actor_params, log_alpha, agent_state,
                                       time_steps, k_actor, weights,
                                       data_actions=actions)

    (_, (actor_loss, alpha_loss)), (actor_grads, alpha_grad) = (
        jax.value_and_grad(_aa_loss, has_aux=True)(
            (agent_state.actor_params, agent_state.log_alpha)))
    if self.gradient_clipping is not None:
      actor_grads = common.clip_gradient_norms(actor_grads,
                                               self.gradient_clipping)
      # The reference clips ALL trained variable groups, including the
      # entropy-temperature parameter (sac_agent.py _apply_gradients) —
      # an unclipped alpha step early in training can overflow
      # exp(log_alpha) and destabilize both critic targets and the
      # actor loss despite clipping being requested.
      alpha_grad = common.clip_gradient_norms(alpha_grad,
                                              self.gradient_clipping)
    au, actor_opt_state = self.actor_optimizer.update(
        actor_grads, agent_state.actor_opt_state, agent_state.actor_params)
    actor_params = optax.apply_updates(agent_state.actor_params, au)
    alu, alpha_opt_state = self.alpha_optimizer.update(
        alpha_grad, agent_state.alpha_opt_state, agent_state.log_alpha)
    log_alpha = optax.apply_updates(agent_state.log_alpha, alu)

    # CQL-Lagrange(H): min_Q max_{alpha>=0} alpha * (cql_gap - tau)
    # (reference eq. 24, cql_sac_agent.py:328-350). The alpha player
    # ascends, so its loss is the negation.
    cql_alpha_loss = jnp.zeros(())
    log_cql_alpha = agent_state.log_cql_alpha
    cql_alpha_opt_state = agent_state.cql_alpha_opt_state
    if self.use_lagrange_cql_alpha:
      gap = jax.lax.stop_gradient(cql_loss) - self.cql_tau

      def _lagrange_loss(log_a):
        la = log_a
        if self.log_cql_alpha_clipping is not None:
          la = jnp.clip(la, self.log_cql_alpha_clipping[0],
                        self.log_cql_alpha_clipping[1])
        return -jnp.exp(la) * gap

      cql_alpha_loss, cql_alpha_grad = jax.value_and_grad(_lagrange_loss)(
          log_cql_alpha)
      cau, cql_alpha_opt_state = self.cql_alpha_optimizer.update(
          cql_alpha_grad, cql_alpha_opt_state, log_cql_alpha)
      log_cql_alpha = optax.apply_updates(log_cql_alpha, cau)

    train_step = agent_state.train_step + 1
    t1 = common.periodic_soft_update(
        train_step, self.target_update_period, c1,
        agent_state.target_critic1_params, self.target_update_tau)
    t2 = common.periodic_soft_update(
        train_step, self.target_update_period, c2,
        agent_state.target_critic2_params, self.target_update_tau)

    new_state = CqlSacAgentState(
        actor_params=actor_params, critic1_params=c1, critic2_params=c2,
        target_critic1_params=t1, target_critic2_params=t2,
        log_alpha=log_alpha, actor_opt_state=actor_opt_state,
        critic_opt_state=critic_opt_state, alpha_opt_state=alpha_opt_state,
        train_step=train_step, log_cql_alpha=log_cql_alpha,
        cql_alpha_opt_state=cql_alpha_opt_state)
    return new_state, LossInfo(
        loss=critic_loss + actor_loss + alpha_loss,
        extra=CqlSacLossExtra(critic_loss=critic_loss,
                              actor_loss=actor_loss, alpha_loss=alpha_loss,
                              cql_loss=cql_loss, cql_alpha=cql_alpha,
                              cql_alpha_loss=cql_alpha_loss))
