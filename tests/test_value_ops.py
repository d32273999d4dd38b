"""Return/GAE math vs naive reference loops (mirrors utils/value_ops_test.py)."""
import jax.numpy as jnp
import numpy as np

from agents_tpu.utils import common, value_ops


def naive_discounted_return(rewards, discounts, final_value):
  T, B = rewards.shape
  out = np.zeros_like(rewards)
  acc = final_value.copy()
  for t in reversed(range(T)):
    acc = rewards[t] + discounts[t] * acc
    out[t] = acc
  return out


def naive_gae(values, final_value, discounts, rewards, lam):
  T, B = values.shape
  next_values = np.concatenate([values[1:], final_value[None]], axis=0)
  deltas = rewards + discounts * next_values - values
  out = np.zeros_like(values)
  acc = np.zeros(B, values.dtype)
  for t in reversed(range(T)):
    acc = deltas[t] + lam * discounts[t] * acc
    out[t] = acc
  return out


def test_discounted_return_matches_naive():
  rng = np.random.RandomState(0)
  T, B = 17, 5
  rewards = rng.randn(T, B).astype(np.float32)
  discounts = (rng.rand(T, B) * 0.99).astype(np.float32)
  final_value = rng.randn(B).astype(np.float32)
  got = value_ops.discounted_return(
      jnp.asarray(rewards), jnp.asarray(discounts),
      final_value=jnp.asarray(final_value))
  want = naive_discounted_return(rewards, discounts, final_value)
  np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_discounted_return_batch_major_first_only():
  rewards = np.array([[1.0, 1.0, 1.0]], np.float32)  # [B=1, T=3]
  discounts = np.full((1, 3), 0.5, np.float32)
  got = value_ops.discounted_return(
      jnp.asarray(rewards), jnp.asarray(discounts), time_major=False,
      provide_all_returns=False)
  np.testing.assert_allclose(np.asarray(got), [1 + 0.5 + 0.25])


def test_gae_matches_naive():
  rng = np.random.RandomState(1)
  T, B = 23, 4
  values = rng.randn(T, B).astype(np.float32)
  final_value = rng.randn(B).astype(np.float32)
  rewards = rng.randn(T, B).astype(np.float32)
  discounts = (rng.rand(T, B)).astype(np.float32) * 0.97
  lam = 0.95
  got = value_ops.generalized_advantage_estimation(
      jnp.asarray(values), jnp.asarray(final_value), jnp.asarray(discounts),
      jnp.asarray(rewards), td_lambda=lam)
  want = naive_gae(values, final_value, discounts, rewards, lam)
  np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_soft_variables_update():
  src = {"w": jnp.ones((3,)), "b": jnp.full((2,), 2.0)}
  tgt = {"w": jnp.zeros((3,)), "b": jnp.zeros((2,))}
  out = common.soft_variables_update(src, tgt, tau=0.1)
  np.testing.assert_allclose(np.asarray(out["w"]), 0.1)
  hard = common.soft_variables_update(src, tgt, tau=1.0)
  np.testing.assert_allclose(np.asarray(hard["b"]), 2.0)


def test_periodic_soft_update():
  src = {"w": jnp.ones((2,))}
  tgt = {"w": jnp.zeros((2,))}
  updated = common.periodic_soft_update(jnp.asarray(4), 2, src, tgt, tau=1.0)
  np.testing.assert_allclose(np.asarray(updated["w"]), 1.0)
  skipped = common.periodic_soft_update(jnp.asarray(5), 2, src, tgt, tau=1.0)
  np.testing.assert_allclose(np.asarray(skipped["w"]), 0.0)


def test_index_with_actions():
  q = jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
  a = jnp.array([0, 2, 3])
  got = common.index_with_actions(q, a)
  np.testing.assert_allclose(np.asarray(got), [0.0, 6.0, 11.0])


def test_huber_loss():
  x = jnp.array([0.0, 0.0])
  y = jnp.array([0.5, 2.0])
  got = common.element_wise_huber_loss(x, y)
  np.testing.assert_allclose(np.asarray(got), [0.125, 1.5])


def test_discounted_future_sum():
  vals = jnp.ones((1, 5))
  out = common.discounted_future_sum(vals, gamma=0.5, num_steps=3)
  np.testing.assert_allclose(np.asarray(out[0, 0]), 1.75)
  np.testing.assert_allclose(np.asarray(out[0, 4]), 1.0)


def test_clip_gradient_norms():
  grads = {"a": jnp.array([3.0, 4.0])}
  clipped = common.clip_gradient_norms(grads, max_norm=1.0)
  np.testing.assert_allclose(
      np.asarray(common.global_norm(clipped)), 1.0, rtol=1e-6)
