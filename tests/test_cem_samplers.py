"""CEM sampler tests (tf_agents/policies/samplers/*_test.py contracts)."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from agents_tpu import specs
from agents_tpu.networks.network import Network
from agents_tpu.policies import (CEMPolicy, GaussianContinuousSampler,
                                 GaussianHybridSampler,
                                 GaussianOneHotSampler)
from agents_tpu.trajectories import time_step as ts

OBS_SPEC = specs.ArraySpec((3,), np.float32)
TSS = ts.time_step_spec(OBS_SPEC)


class _CriticModule(nn.Module):
  """Q peaks when the (flattened, float-cast) action matches target."""
  target: tuple

  @nn.compact
  def __call__(self, inputs, step_type=None, state=()):
    obs, action = inputs
    leaves = jax.tree_util.tree_leaves(action)
    a = jnp.concatenate(
        [l.reshape(l.shape[0], -1).astype(jnp.float32) for l in leaves], -1)
    t = jnp.asarray(self.target, jnp.float32)
    return -jnp.sum(jnp.square(a - t), axis=-1), state


def _critic(target, input_spec):
  return Network(_CriticModule(tuple(target)), input_spec)


def test_continuous_sampler_finds_target():
  act = specs.BoundedArraySpec((2,), np.float32, -1.0, 1.0)
  net = _critic([0.5, -0.25], (OBS_SPEC, act))
  pol = CEMPolicy(TSS, act, net, num_samples=64, num_elites=8,
                  num_iterations=10)
  params = net.init_params(jax.random.key(0), batch_size=2)
  step = ts.restart(jnp.zeros((4, 3)), batch_size=4)
  action, q = jax.jit(pol.optimize)(params, step, jax.random.key(1))
  np.testing.assert_allclose(np.asarray(action),
                             np.tile([0.5, -0.25], (4, 1)), atol=0.1)


def test_continuous_sampler_respects_bounds():
  act = specs.BoundedArraySpec((2,), np.float32, -1.0, 1.0)
  sampler = GaussianContinuousSampler(act)
  dp = sampler.init(3)
  samples = sampler.sample_batch_and_clip(jax.random.key(0), 16, dp)
  assert samples[0].shape == (16, 3, 2)
  assert np.all(np.asarray(samples[0]) >= -1.0)
  assert np.all(np.asarray(samples[0]) <= 1.0)


def test_hybrid_sampler_mixed_spec():
  act = {"cont": specs.BoundedArraySpec((2,), np.float32, -1.0, 1.0),
         "disc": specs.BoundedArraySpec((), np.int32, 0, 4)}
  sampler = GaussianHybridSampler(act)
  dp = sampler.init(3)
  samples = sampler.sample_batch_and_clip(jax.random.key(0), 16, dp)
  # Discrete leaf is integral-valued within bounds.
  disc = np.asarray(samples[1])
  np.testing.assert_allclose(disc, np.round(disc))
  assert disc.min() >= 0 and disc.max() <= 4
  # Refit keeps shapes.
  elite_idx = jnp.zeros((3, 4), jnp.int32)
  means, variances = sampler.refit_distribution_to(elite_idx, samples)
  assert means[0].shape == (3, 2) and means[1].shape == (3,)
  mode = sampler.mode((means, variances))
  assert mode[1].dtype == np.int32


def test_hybrid_cem_policy_optimizes_mixed_action():
  act = {"cont": specs.BoundedArraySpec((1,), np.float32, -1.0, 1.0),
         "disc": specs.BoundedArraySpec((), np.int32, 0, 4)}
  net = _critic([0.5, 3.0], (OBS_SPEC, act))
  pol = CEMPolicy(TSS, act, net, num_samples=128, num_elites=8,
                  num_iterations=10, sampler=GaussianHybridSampler(act))
  params = net.init_params(jax.random.key(0), batch_size=2)
  step = ts.restart(jnp.zeros((4, 3)), batch_size=4)
  action, _ = jax.jit(pol.optimize)(params, step, jax.random.key(1))
  np.testing.assert_allclose(np.asarray(action["cont"])[:, 0], 0.5,
                             atol=0.15)
  np.testing.assert_array_equal(np.asarray(action["disc"]),
                                np.full((4,), 3, np.int32))


def test_one_hot_sampler_samples_valid_one_hots():
  act = {"cont": specs.BoundedArraySpec((2,), np.float32, -1.0, 1.0),
         "onehot": specs.BoundedArraySpec((4,), np.int32, 0, 1)}
  sampler = GaussianOneHotSampler(act)
  dp = sampler.init(3)
  samples = sampler.sample_batch_and_clip(jax.random.key(0), 16, dp)
  oh = np.asarray(samples[1])  # alphabetical key order: cont, onehot
  assert oh.shape == (16, 3, 4)
  np.testing.assert_allclose(oh.sum(-1), 1.0)
  np.testing.assert_allclose(np.unique(oh), [0.0, 1.0])


def test_one_hot_cem_policy_selects_best_category():
  act = specs.BoundedArraySpec((4,), np.int32, 0, 1)
  # Target one-hot = category 2.
  net = _critic([0.0, 0.0, 1.0, 0.0], (OBS_SPEC, act))
  pol = CEMPolicy(TSS, act, net, num_samples=64, num_elites=8,
                  num_iterations=8, sampler=GaussianOneHotSampler(act))
  params = net.init_params(jax.random.key(0), batch_size=2)
  step = ts.restart(jnp.zeros((4, 3)), batch_size=4)
  action, _ = jax.jit(pol.optimize)(params, step, jax.random.key(1))
  np.testing.assert_array_equal(np.asarray(jnp.argmax(action, -1)),
                                np.full((4,), 2))
