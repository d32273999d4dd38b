"""The benchmark/stubs mini-tfp must be mathematically REAL where the
reference-SAC baseline path touches it: a wrong tanh change-of-variables
would silently invalidate the measured v2->v5 offset
(benchmark/ref_sac_baseline.py). Validated here against closed forms.
"""
import os
import sys

import numpy as np
import pytest

STUBS = os.path.join(os.path.dirname(__file__), "..", "benchmark", "stubs")


@pytest.fixture(scope="module")
def tfp():
  sys.path.insert(0, STUBS)
  try:
    import tensorflow_probability as tfp_mod
  except Exception as e:  # pragma: no cover
    pytest.skip(f"tf/stub unavailable: {e}")
  yield tfp_mod
  sys.path.remove(STUBS)


def _np_normal_logpdf(x, loc, scale):
  return (-0.5 * ((x - loc) / scale) ** 2 - np.log(scale)
          - 0.5 * np.log(2 * np.pi))


def test_normal_and_mvn_log_prob(tfp):
  rng = np.random.RandomState(0)
  loc = rng.randn(5, 3).astype(np.float32)
  scale = rng.uniform(0.5, 2.0, (5, 3)).astype(np.float32)
  x = rng.randn(5, 3).astype(np.float32)
  n = tfp.distributions.Normal(loc, scale)
  np.testing.assert_allclose(np.asarray(n.log_prob(x)),
                             _np_normal_logpdf(x, loc, scale), rtol=1e-5)
  mvn = tfp.distributions.MultivariateNormalDiag(loc=loc, scale_diag=scale)
  np.testing.assert_allclose(
      np.asarray(mvn.log_prob(x)),
      _np_normal_logpdf(x, loc, scale).sum(-1), rtol=1e-5)
  # Reparameterized sampling: mean/std of many samples match params.
  s = np.asarray(n.sample(4000, seed=1))
  assert s.shape == (4000, 5, 3)
  np.testing.assert_allclose(s.mean(0), loc, atol=0.15)
  np.testing.assert_allclose(s.std(0), scale, atol=0.2)


def test_tanh_chain_change_of_variables(tfp):
  """log p_Y(y) for Y = m + a*tanh(X), X ~ MVN-diag, against the closed
  form: sum_i [ logN(x_i) - log a_i - log(1 - tanh(x_i)^2) ]."""
  rng = np.random.RandomState(1)
  D = 4
  loc = rng.randn(6, D).astype(np.float32)
  scale = rng.uniform(0.3, 1.5, (6, D)).astype(np.float32)
  means = rng.uniform(-0.5, 0.5, (D,)).astype(np.float32)
  mags = rng.uniform(0.5, 3.0, (D,)).astype(np.float32)

  mvn = tfp.distributions.MultivariateNormalDiag(loc=loc, scale_diag=scale)
  chain = tfp.bijectors.Chain([
      tfp.bijectors.Shift(means)(tfp.bijectors.Scale(mags)),
      _stable_tanh(),
  ])
  td = tfp.distributions.TransformedDistribution(distribution=mvn,
                                                 bijector=chain)
  x = rng.randn(6, D).astype(np.float32) * 0.8
  y = means + mags * np.tanh(x)
  expected = (_np_normal_logpdf(x, loc, scale)
              - np.log(mags)[None, :]
              - np.log1p(-np.tanh(x) ** 2 + 1e-12)).sum(-1)
  np.testing.assert_allclose(np.asarray(td.log_prob(y)), expected,
                             rtol=2e-4, atol=2e-4)
  # forward/inverse round trip + samples inside the spec box
  np.testing.assert_allclose(np.asarray(chain.inverse(y)), x, atol=1e-4)
  s = np.asarray(td.sample(200, seed=3))
  assert np.all(s <= means + mags + 1e-5)
  assert np.all(s >= means - mags - 1e-5)


def _stable_tanh():
  """The reference's own stable Tanh bijector, subclassing the stub base
  — exactly what SquashToSpecNormal chains at runtime."""
  sys.path.insert(0, "/root/reference")
  try:
    from tf_agents.distributions import tanh_bijector_stable
  finally:
    sys.path.remove("/root/reference")
  return tanh_bijector_stable.Tanh()


def test_squash_to_spec_normal_end_to_end(tfp):
  """The reference's SquashToSpecNormal built on the stub: mode, sample
  bounds, and log_prob consistency (what SAC's actor/alpha losses use)."""
  import tensorflow as tf
  sys.path.insert(0, "/root/reference")
  try:
    from tf_agents.distributions import utils as dist_utils
    from tf_agents.specs import tensor_spec
  finally:
    sys.path.remove("/root/reference")

  spec = tensor_spec.BoundedTensorSpec((3,), tf.float32, -2.0, 2.0)
  loc = tf.constant(np.random.RandomState(2).randn(5, 3), tf.float32)
  scale = tf.fill([5, 3], 0.7)
  mvn = tfp.distributions.MultivariateNormalDiag(loc=loc, scale_diag=scale)
  sq = dist_utils.scale_distribution_to_spec(mvn, spec)
  mode = np.asarray(sq.mode())
  np.testing.assert_allclose(mode, 2.0 * np.tanh(np.asarray(loc)),
                             rtol=1e-5)
  s = np.asarray(sq.sample(seed=4))
  assert np.all(np.abs(s) <= 2.0)
  lp = np.asarray(sq.log_prob(s))
  assert lp.shape == (5,) and np.all(np.isfinite(lp))
