"""Cross-entropy-method action optimizer over a Q-network (QtOpt).

Analogue of ``tf_agents/policies/qtopt_cem_policy.py:86`` (CEMPolicy with
the iterative Gaussian refit loop :263-340) and the continuous sampler in
``policies/samplers/``. The refit loop is a `lax.fori_loop`; all N
candidate evaluations per iteration are one batched critic call (MXU-
friendly), vs the reference's per-iteration tf.map_fn.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from agents_tpu.policies.policy import Policy, clip_to_spec
from agents_tpu.specs import array_spec
from agents_tpu.trajectories import policy_step as ps


class CEMPolicy(Policy):
  """argmax_a Q(s, a) via CEM over bounded continuous actions."""

  def __init__(self, time_step_spec, action_spec, q_network,
               num_samples: int = 32, num_elites: int = 4,
               num_iterations: int = 3, initial_std: float = 0.33):
    super().__init__(time_step_spec, action_spec, clip=True)
    leaves = jax.tree_util.tree_leaves(
        action_spec, is_leaf=lambda s: isinstance(s, array_spec.ArraySpec))
    if len(leaves) != 1:
      raise ValueError("CEMPolicy supports a single continuous action leaf")
    self.spec = leaves[0]
    self.q_network = q_network
    self.num_samples = num_samples
    self.num_elites = num_elites
    self.num_iterations = num_iterations
    self.initial_std = initial_std

  def optimize(self, params, time_step, key):
    """Returns (best_action [B, ...], best_q [B])."""
    spec = self.spec
    B = time_step.step_type.shape[0]
    a_shape = (B,) + spec.shape
    lo = jnp.asarray(spec.minimum, jnp.float32)
    hi = jnp.asarray(spec.maximum, jnp.float32)
    span = hi - lo

    mean0 = jnp.broadcast_to((lo + hi) / 2.0, a_shape)
    std0 = jnp.broadcast_to(span * self.initial_std, a_shape)

    def eval_q(actions):  # [N, B, ...] -> [N, B]
      def one(a):
        q, _ = self.q_network.apply(
            params, (time_step.observation, a), time_step.step_type, ())
        return q
      N = actions.shape[0]
      flat = actions.reshape((N * B,) + spec.shape)
      obs_tiled = jax.tree_util.tree_map(
          lambda o: jnp.repeat(o[None], N, 0).reshape((N * B,) + o.shape[1:]),
          time_step.observation)
      st_tiled = jnp.repeat(time_step.step_type[None], N, 0).reshape(N * B)
      q, _ = self.q_network.apply(params, (obs_tiled, flat), st_tiled, ())
      return q.reshape(N, B)

    def body(i, carry):
      mean, std, k = carry
      k, sub = jax.random.split(k)
      eps = jax.random.normal(sub, (self.num_samples,) + a_shape)
      samples = jnp.clip(mean[None] + std[None] * eps, lo, hi)
      q = eval_q(samples)                                   # [N, B]
      # Top-k elites per batch element.
      _, elite_idx = jax.lax.top_k(q.T, self.num_elites)    # [B, E]
      # Gather elites: samples [N, B, ...] -> [B, E, ...]
      samples_bt = jnp.moveaxis(samples, 0, 1)              # [B, N, ...]
      elites = jnp.take_along_axis(
          samples_bt, elite_idx.reshape(
              (B, self.num_elites) + (1,) * len(spec.shape)), axis=1)
      new_mean = jnp.mean(elites, axis=1)
      new_std = jnp.std(elites, axis=1) + 1e-6
      return new_mean, new_std, k

    mean, std, key = jax.lax.fori_loop(
        0, self.num_iterations, body, (mean0, std0, key))
    q_final, _ = self.q_network.apply(
        params, (time_step.observation, mean), time_step.step_type, ())
    return jnp.clip(mean, lo, hi), q_final

  def _action(self, params, time_step, state, key):
    action, _ = self.optimize(params, time_step, key)
    return ps.PolicyStep(action=action, state=state, info=())

  def _distribution(self, params, time_step, state):
    raise NotImplementedError("CEM acts by optimization")
