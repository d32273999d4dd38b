"""Shared training utilities.

Analogue of the parts of ``tf_agents/utils/common.py`` that survive the move
to a functional JAX design: target-network polyak updates
(soft_variables_update :250), action indexing (index_with_actions :367),
periodic triggers (Periodically :450), OU process (:594), log-prob/entropy
aggregation (:682,:717), discounted sums (:758,:978), element-wise losses
(:1199-1210), and replica-aware loss aggregation (aggregate_losses :1400).

Checkpointing lives in ``agents_tpu.train.checkpoint_utils`` (orbax), not
here — there is no `tf.train.Checkpoint` analogue needed in a pytree world.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp


class LossInfo(NamedTuple):
  """(loss, extra) as produced by every agent (reference tf_agent.py:37)."""
  loss: Any
  extra: Any = ()


def soft_variables_update(source_params, target_params, tau: float = 1.0):
  """Polyak averaging: target <- tau*source + (1-tau)*target (reference :250).

  With tau == 1.0 this is a hard copy. Pure function returning the new
  target pytree; XLA fuses the whole update into one pass over HBM.
  """
  if tau == 1.0:
    return source_params
  return jax.tree_util.tree_map(
      lambda s, t: tau * s + (1.0 - tau) * t, source_params, target_params)


def periodically(step, period: int):
  """True every `period` steps (the jit-safe Periodically; reference :450)."""
  return (step % period) == 0


def periodic_soft_update(step, period: int, source_params, target_params,
                         tau: float):
  """Apply polyak update every `period` steps, identity otherwise.

  The branch is a `jnp.where` select so the program stays trace-static.
  """
  new_target = soft_variables_update(source_params, target_params, tau)
  do = periodically(step, period)
  return jax.tree_util.tree_map(
      lambda n, t: jnp.where(do, n, t), new_target, target_params)


def index_with_actions(q_values, actions, multi_dim_actions: bool = False):
  """q_values[..., actions] along the last axis (reference :367).

  With ``multi_dim_actions``, actions' trailing dim indexes the SAME
  number of trailing q_values dims: q [B..., d1, ..., dk] with actions
  [B..., k] -> values [B...] (the reference's batch_dims gather)."""
  actions = actions.astype(jnp.int32)
  if multi_dim_actions:
    k = actions.shape[-1]
    outer = jnp.indices(actions.shape[:-1])
    inner = tuple(jnp.moveaxis(actions, -1, 0))
    if q_values.ndim != actions.ndim - 1 + k:
      raise ValueError(
          f"q_values rank {q_values.ndim} does not match outer rank "
          f"{actions.ndim - 1} + {k} action dims")
    return q_values[(*outer, *inner)]
  return jnp.take_along_axis(q_values, actions[..., None], axis=-1).squeeze(-1)


def element_wise_squared_loss(x, y):
  """0.5 factor-free squared loss (reference :1199)."""
  return jnp.square(x - y)


def element_wise_huber_loss(x, y, delta: float = 1.0):
  """Per-element Huber loss (reference :1205)."""
  err = x - y
  abs_err = jnp.abs(err)
  quadratic = jnp.minimum(abs_err, delta)
  linear = abs_err - quadratic
  return 0.5 * quadratic**2 + delta * linear


def clip_gradient_norms(grads, max_norm: float):
  """Global-norm gradient clipping (eager_utils.clip_gradient_norms)."""
  gnorm = global_norm(grads)
  scale = jnp.minimum(1.0, max_norm / jnp.maximum(gnorm, 1e-12))
  return jax.tree_util.tree_map(lambda g: g * scale, grads)


def global_norm(tree):
  leaves = jax.tree_util.tree_leaves(tree)
  return jnp.sqrt(sum(jnp.sum(jnp.square(l)) for l in leaves))


def log_probability(distributions, actions, action_spec=None):
  """Sum of per-leaf log-probs over a nest of distributions (reference :682)."""
  lps = jax.tree_util.tree_map(
      lambda d, a: d.log_prob(a), distributions, actions,
      is_leaf=lambda x: hasattr(x, "log_prob"))
  leaves = jax.tree_util.tree_leaves(lps)
  total = leaves[0]
  for l in leaves[1:]:
    total = total + l
  return total


def entropy(distributions, action_spec=None):
  """Sum of per-leaf entropies (reference :717)."""
  ents = jax.tree_util.tree_map(
      lambda d: d.entropy(), distributions,
      is_leaf=lambda x: hasattr(x, "entropy"))
  leaves = jax.tree_util.tree_leaves(ents)
  total = leaves[0]
  for l in leaves[1:]:
    total = total + l
  return total


def discounted_future_sum(values, gamma: float, num_steps: int):
  """Windowed discounted sums (reference :758-820).

  out[t] = sum_{n=0}^{num_steps-1} gamma^n * values[t+n]  (zero-padded).
  values: [B, T].
  """
  b, t = values.shape
  padded = jnp.pad(values, ((0, 0), (0, num_steps - 1)))
  powers = gamma ** jnp.arange(num_steps, dtype=values.dtype)
  # Gather windows via a strided stack: [B, T, num_steps]
  idx = jnp.arange(t)[:, None] + jnp.arange(num_steps)[None, :]
  windows = padded[:, idx]
  return jnp.sum(windows * powers[None, None, :], axis=-1)


def compute_returns(rewards, discounts, time_major: bool = False):
  """Return-to-go per step (reference :978). rewards/discounts: [T] or [T,B]."""
  from agents_tpu.utils import value_ops
  if not time_major and rewards.ndim > 1:
    return value_ops.discounted_return(
        rewards, discounts, time_major=False)
  return value_ops.discounted_return(rewards, discounts, time_major=True)


class OUProcess:
  """Ornstein-Uhlenbeck noise as a pure (state, key) -> (state, noise) step
  (reference common.py:594-680's stateful variable version, made functional).
  """

  def __init__(self, spec_shape, damping: float = 0.15, stddev: float = 0.2,
               dtype=jnp.float32):
    self.shape = tuple(spec_shape)
    self.damping = damping
    self.stddev = stddev
    self.dtype = dtype

  def init_state(self, batch_shape=()):
    return jnp.zeros(tuple(batch_shape) + self.shape, self.dtype)

  def step(self, state, key):
    noise = jax.random.normal(key, state.shape, self.dtype) * self.stddev
    new_state = (1.0 - self.damping) * state + noise
    return new_state, new_state


def aggregate_losses(per_example_loss=None, sample_weight=None,
                     regularization_loss=None, global_batch_size=None,
                     axis_name: Optional[str] = None):
  """Replica-aware loss aggregation (reference common.py:1400-1487).

  Under `shard_map`/`pjit` with a named `data` axis, dividing by the GLOBAL
  batch size and psumming gradients reproduces the reference's
  `num_replicas_in_sync` scaling. Returns the scalar total loss.
  """
  total = 0.0
  if per_example_loss is not None:
    loss = per_example_loss
    if sample_weight is not None:
      loss = loss * sample_weight
    if global_batch_size is not None:
      total = total + jnp.sum(loss) / global_batch_size
    else:
      denom = loss.size
      if axis_name is not None:
        denom = denom * jax.lax.psum(1, axis_name)
      total = total + jnp.sum(loss) / denom
  if regularization_loss is not None:
    reg = jnp.sum(regularization_loss)
    if axis_name is not None:
      reg = reg / jax.lax.psum(1, axis_name)
    total = total + reg
  return total


def replicate(nest, outer_shape):
  """Broadcast every leaf to outer_shape + leaf.shape (reference :1103)."""
  outer = tuple(outer_shape)
  return jax.tree_util.tree_map(
      lambda x: jnp.broadcast_to(x, outer + jnp.shape(x)), nest)
