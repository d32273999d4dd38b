"""Return / advantage computation as parallel-prefix scans.

Analogue of ``tf_agents/utils/value_ops.py`` (discounted_return :21,
generalized_advantage_estimation :102). The reference uses a sequential
reverse ``tf.scan``; on TPU both quantities are first-order linear
recurrences ``y_t = a_t * y_{t+1} + b_t`` which we evaluate with
``jax.lax.associative_scan`` — O(log T) depth, fully vectorized on the VPU,
instead of a T-step sequential loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def reverse_linear_scan(a, b):
  """Solve y_t = a_t * y_{t+1} + b_t with y_T = 0, along axis 0.

  The affine maps (a, b) compose associatively:
    (a1, b1) . (a2, b2) = (a1*a2, b1 + a1*b2)
  so a reversed associative scan evaluates all suffix compositions in
  O(log T) parallel steps.
  """

  def combine(later, earlier):
    # With reverse=True, jax passes the higher-time-index partial product
    # first; composing f_earlier ∘ f_later gives the suffix map.
    a_x, b_x = later
    a_y, b_y = earlier
    return a_x * a_y, b_y + a_y * b_x

  _, y = jax.lax.associative_scan(combine, (a, b), axis=0, reverse=True)
  return y


def discounted_return(rewards, discounts, final_value=None, time_major=True,
                      provide_all_returns=True):
  """Discounted cumulative return (reference value_ops.py:21-100).

  ``G_t = r_t + d_t * G_{t+1}``, with ``G_T`` bootstrapped from
  `final_value` (or 0). `discounts` already include gamma.

  Args:
    rewards: [T, B] (time_major) or [B, T].
    discounts: same shape as rewards.
    final_value: [B] bootstrap value, defaults to zeros.
    time_major: axis layout.
    provide_all_returns: if False, return only G_0 (shape [B]).
  """
  if not time_major:
    rewards = jnp.swapaxes(rewards, 0, 1)
    discounts = jnp.swapaxes(discounts, 0, 1)
  if final_value is None:
    bootstrap = jnp.zeros_like(rewards[-1])
  else:
    bootstrap = final_value.astype(rewards.dtype)
  # Fold the bootstrap into the last step's additive term.
  b = rewards.at[-1].add(discounts[-1] * bootstrap)
  returns = reverse_linear_scan(discounts, b)
  if not provide_all_returns:
    return returns[0]
  if not time_major:
    returns = jnp.swapaxes(returns, 0, 1)
  return returns


def generalized_advantage_estimation(values, final_value, discounts, rewards,
                                     td_lambda=1.0, time_major=True):
  """GAE(lambda) advantages (reference value_ops.py:102-200).

  ``delta_t = r_t + d_t * V_{t+1} - V_t``
  ``A_t = delta_t + lambda * d_t * A_{t+1}``

  Args:
    values: [T, B] state values V_t.
    final_value: [B] value of the state after the last step (V_T).
    discounts: [T, B] discounts (already including gamma).
    rewards: [T, B].
    td_lambda: lambda mixing parameter.
    time_major: axis layout.
  """
  if not time_major:
    values = jnp.swapaxes(values, 0, 1)
    discounts = jnp.swapaxes(discounts, 0, 1)
    rewards = jnp.swapaxes(rewards, 0, 1)
  next_values = jnp.concatenate([values[1:], final_value[None]], axis=0)
  deltas = rewards + discounts * next_values - values
  advantages = reverse_linear_scan(td_lambda * discounts, deltas)
  if not time_major:
    advantages = jnp.swapaxes(advantages, 0, 1)
  return advantages
