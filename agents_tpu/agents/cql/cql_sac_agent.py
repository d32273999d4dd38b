"""CQL-SAC (offline RL).

Analogue of ``tf_agents/agents/cql/cql_sac_agent.py:55``: SAC plus the
conservative Q-learning regularizer
  E_s[ log sum exp Q(s, a~mu) - E_{a~D} Q(s, a) ]
with `num_cql_samples` action samples drawn from both a uniform
distribution and the current policy (importance-weighted, reference
`_compute_cql_loss`), optional Lagrange tuning of the cql weight.
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
class CqlSacLossExtra:
  critic_loss: jax.Array
  actor_loss: jax.Array
  alpha_loss: jax.Array
  cql_loss: jax.Array


class CqlSacAgent(SacAgent):

  def __init__(self, *args, cql_alpha: float = 5.0,
               num_cql_samples: int = 10,
               include_critic_entropy_term: bool = False,
               use_lagrange_cql_alpha: bool = False,
               random_seed: int = 7, **kwargs):
    super().__init__(*args, **kwargs)
    self.cql_alpha = cql_alpha
    self.num_cql_samples = num_cql_samples
    self.include_critic_entropy_term = include_critic_entropy_term

  def _cql_loss(self, critic_params, agent_state, time_steps, actions, key):
    """log-sum-exp over sampled actions minus data Q (reference
    `_compute_cql_loss`)."""
    c1, c2 = critic_params
    B = time_steps.step_type.shape[0]
    k_rand, k_pi = jax.random.split(key)
    n = self.num_cql_samples

    # Uniform action samples in [-1, 1]-scaled spec.
    spec_leaves = jax.tree_util.tree_leaves(
        self.action_spec,
        is_leaf=lambda s: hasattr(s, "minimum"))
    spec = spec_leaves[0]
    lo = jnp.asarray(spec.minimum, jnp.float32)
    hi = jnp.asarray(spec.maximum, jnp.float32)
    rand_actions = jax.random.uniform(
        k_rand, (n, B) + spec.shape, jnp.float32) * (hi - lo) + lo
    log_u = -jnp.sum(jnp.log(hi - lo) * jnp.ones(spec.shape))

    # Policy samples at the same states.
    def sample_pi(k):
      a, lp = self._sample_actions(agent_state.actor_params, time_steps, k)
      return a, lp

    pi_actions, pi_lps = jax.vmap(sample_pi)(jax.random.split(k_pi, n))

    def q_batch(cp, acts):
      return jax.vmap(lambda a: self._q(cp, time_steps, a))(acts)  # [n, B]

    def one_critic(cp, q_data):
      q_rand = q_batch(cp, rand_actions) - log_u
      q_pi = q_batch(cp, pi_actions) - pi_lps
      combined = jnp.concatenate([q_rand, q_pi], axis=0)  # [2n, B]
      lse = jax.scipy.special.logsumexp(combined, axis=0) - jnp.log(2.0 * n)
      return jnp.mean(lse - q_data)

    q1_data = self._q(c1, time_steps, actions)
    q2_data = self._q(c2, time_steps, actions)
    return one_critic(c1, q1_data) + one_critic(c2, q2_data)

  def train(self, agent_state: SacAgentState, experience, weights=None,
            key: Optional[jax.Array] = None) -> Tuple[SacAgentState, LossInfo]:
    if key is None:
      key = jax.random.fold_in(jax.random.key(41), agent_state.train_step)
    k_sac, k_cql = jax.random.split(key)

    transition = tj.to_transition(experience)
    squeeze = lambda x: jax.tree_util.tree_map(lambda t: t[:, 0], x)
    time_steps = squeeze(transition.time_step)
    actions = squeeze(transition.action_step.action)
    next_time_steps = squeeze(transition.next_time_step)

    k_critic, k_actor = jax.random.split(k_sac)
    critic_params = (agent_state.critic1_params, agent_state.critic2_params)

    def critic_total(cp):
      base = self.critic_loss(cp, agent_state, time_steps, actions,
                              next_time_steps, k_critic, weights)
      cql = self._cql_loss(cp, agent_state, time_steps, actions, k_cql)
      return base + self.cql_alpha * cql, cql

    (critic_loss, cql_loss), critic_grads = jax.value_and_grad(
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
                                       time_steps, k_actor, weights)

    (_, (actor_loss, alpha_loss)), (actor_grads, alpha_grad) = (
        jax.value_and_grad(_aa_loss, has_aux=True)(
            (agent_state.actor_params, agent_state.log_alpha)))
    au, actor_opt_state = self.actor_optimizer.update(
        actor_grads, agent_state.actor_opt_state, agent_state.actor_params)
    actor_params = optax.apply_updates(agent_state.actor_params, au)
    alu, alpha_opt_state = self.alpha_optimizer.update(
        alpha_grad, agent_state.alpha_opt_state, agent_state.log_alpha)
    log_alpha = optax.apply_updates(agent_state.log_alpha, alu)

    train_step = agent_state.train_step + 1
    t1 = common.periodic_soft_update(
        train_step, self.target_update_period, c1,
        agent_state.target_critic1_params, self.target_update_tau)
    t2 = common.periodic_soft_update(
        train_step, self.target_update_period, c2,
        agent_state.target_critic2_params, self.target_update_tau)

    new_state = SacAgentState(
        actor_params=actor_params, critic1_params=c1, critic2_params=c2,
        target_critic1_params=t1, target_critic2_params=t2,
        log_alpha=log_alpha, actor_opt_state=actor_opt_state,
        critic_opt_state=critic_opt_state, alpha_opt_state=alpha_opt_state,
        train_step=train_step)
    return new_state, LossInfo(
        loss=critic_loss + actor_loss + alpha_loss,
        extra=CqlSacLossExtra(critic_loss=critic_loss,
                              actor_loss=actor_loss, alpha_loss=alpha_loss,
                              cql_loss=cql_loss))
