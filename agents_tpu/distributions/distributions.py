"""Minimal in-repo distribution library (the TFP replacement).

The reference leans on tensorflow_probability for policy heads
(``tf_agents/distributions/``, ``networks/*_projection_network.py``). Here
distributions are lightweight pytree dataclasses over their parameters —
they trace through `jit`/`vmap`/`scan` and live entirely on device.

Provided: Normal, Independent, SquashedNormal (tanh-squashed to bounds —
the analogue of ``distributions/utils.SquashToSpecNormal`` (:40) built on the
numerically stable Tanh bijector (tanh_bijector_stable.py:31)), Categorical,
MaskedCategorical (masked.py:21), ShiftedCategorical, OneHotCategorical,
GumbelSoftmax (gumbel_softmax.py:26), Bernoulli, Beta, Deterministic.

Event/batch semantics: `log_prob` returns one value per *batch* element
(event dims are reduced by Independent / SquashedNormal); `sample(key,
sample_shape)` prepends `sample_shape`.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

_LOG_2PI = math.log(2.0 * math.pi)
_HALF_LOG_2PIE = 0.5 * math.log(2.0 * math.pi * math.e)


class Distribution:
  """Duck-typed base; subclasses are flax.struct dataclasses."""

  def sample(self, key, sample_shape=()):
    raise NotImplementedError

  def log_prob(self, value):
    raise NotImplementedError

  def entropy(self):
    raise NotImplementedError

  def mode(self):
    raise NotImplementedError

  def mean(self):
    raise NotImplementedError

  def sample_and_log_prob(self, key, sample_shape=()):
    x = self.sample(key, sample_shape)
    return x, self.log_prob(x)


@struct.dataclass
class Normal(Distribution):
  loc: Any
  scale: Any

  def sample(self, key, sample_shape=()):
    # Batch shape is the BROADCAST of loc and scale (TFP semantics):
    # Normal(loc=0.0, scale=ones(B)) must draw B independent eps, not
    # one scalar eps reused across the batch.
    batch = jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.scale))
    shape = tuple(sample_shape) + batch
    eps = jax.random.normal(key, shape, jnp.result_type(self.loc))
    return self.loc + self.scale * eps

  def log_prob(self, value):
    z = (value - self.loc) / self.scale
    return -0.5 * (z**2 + _LOG_2PI) - jnp.log(self.scale)

  def entropy(self):
    # Broadcast to the batch shape like sample(): with a scalar scale
    # over a batched loc, entropy is still per-batch-element.
    batch = jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.scale))
    return jnp.broadcast_to(_HALF_LOG_2PIE + jnp.log(self.scale), batch)

  def mode(self):
    return jnp.broadcast_to(
        self.loc,
        jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.scale)))

  def mean(self):
    return self.mode()

  def stddev(self):
    return jnp.broadcast_to(
        self.scale,
        jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.scale)))

  def kl_divergence(self, other: "Normal"):
    var_ratio = (self.scale / other.scale) ** 2
    t1 = ((self.loc - other.loc) / other.scale) ** 2
    return 0.5 * (var_ratio + t1 - 1.0 - jnp.log(var_ratio))


@struct.dataclass
class Independent(Distribution):
  """Reinterprets the last `reinterpreted_batch_ndims` dims as event dims."""
  base: Distribution
  reinterpreted_batch_ndims: int = struct.field(pytree_node=False, default=1)

  def _reduce(self, x):
    axes = tuple(range(-self.reinterpreted_batch_ndims, 0))
    return jnp.sum(x, axis=axes) if axes else x

  def sample(self, key, sample_shape=()):
    return self.base.sample(key, sample_shape)

  def log_prob(self, value):
    return self._reduce(self.base.log_prob(value))

  def entropy(self):
    return self._reduce(self.base.entropy())

  def mode(self):
    return self.base.mode()

  def mean(self):
    return self.base.mean()

  def stddev(self):
    return self.base.stddev()

  def kl_divergence(self, other):
    base_other = other.base if isinstance(other, Independent) else other
    return self._reduce(self.base.kl_divergence(base_other))


@struct.dataclass
class SquashedNormal(Distribution):
  """Normal squashed by tanh then affinely mapped into [low, high].

  action = low + (high - low)/2 * (tanh(u) + 1),  u ~ Normal(loc, scale).

  ``log_prob`` uses the numerically stable log-det-jacobian
  ``log(1 - tanh(u)^2) = 2*(log2 - u - softplus(-2u))`` (the reference's
  stable Tanh bijector, tanh_bijector_stable.py:31) and reduces event dims.
  ``entropy`` is not analytic; use ``-log_prob(sample)`` estimates (as SAC
  does).
  """
  loc: Any
  scale: Any
  low: Any = 0.0
  high: Any = 1.0
  event_ndims: int = struct.field(pytree_node=False, default=1)

  @property
  def _half_range(self):
    return (self.high - self.low) / 2.0

  def _squash(self, u):
    return self.low + self._half_range * (jnp.tanh(u) + 1.0)

  def _unsquash(self, x):
    # Inverse; clip for numerical safety at the boundaries.
    y = (x - self.low) / self._half_range - 1.0
    y = jnp.clip(y, -1.0 + 1e-6, 1.0 - 1e-6)
    return jnp.arctanh(y)

  def sample(self, key, sample_shape=()):
    batch = jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.scale))
    shape = tuple(sample_shape) + batch
    u = self.loc + self.scale * jax.random.normal(
        key, shape, jnp.result_type(self.loc))
    return self._squash(u)

  def sample_and_log_prob(self, key, sample_shape=()):
    batch = jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.scale))
    shape = tuple(sample_shape) + batch
    u = self.loc + self.scale * jax.random.normal(
        key, shape, jnp.result_type(self.loc))
    return self._squash(u), self._log_prob_from_u(u)

  def _log_prob_from_u(self, u):
    base = Normal(self.loc, self.scale).log_prob(u)
    # d(action)/du = half_range * (1 - tanh(u)^2)
    log_det = (jnp.log(self._half_range + jnp.zeros_like(u))
               + 2.0 * (math.log(2.0) - u - jax.nn.softplus(-2.0 * u)))
    lp = base - log_det
    axes = tuple(range(-self.event_ndims, 0))
    return jnp.sum(lp, axis=axes) if axes else lp

  def log_prob(self, value):
    return self._log_prob_from_u(self._unsquash(value))

  def mode(self):
    return self._squash(self.loc)

  def mean(self):
    # No closed form; tanh(loc) is the standard approximation used by the
    # reference's SquashToSpecNormal.mean.
    return self._squash(self.loc)

  def stddev(self):
    return self._half_range * self.scale


@struct.dataclass
class Categorical(Distribution):
  """Categorical over the last axis of `logits`."""
  logits: Any
  dtype: Any = struct.field(pytree_node=False, default=jnp.int32)

  @property
  def probs(self):
    return jax.nn.softmax(self.logits, axis=-1)

  @property
  def log_probs(self):
    return jax.nn.log_softmax(self.logits, axis=-1)

  def sample(self, key, sample_shape=()):
    shape = tuple(sample_shape) + jnp.shape(self.logits)[:-1]
    return jax.random.categorical(
        key, self.logits, axis=-1, shape=shape).astype(self.dtype)

  def log_prob(self, value):
    lp = self.log_probs
    return jnp.take_along_axis(
        lp, value[..., None].astype(jnp.int32), axis=-1).squeeze(-1)

  def entropy(self):
    lp = self.log_probs
    return -jnp.sum(jnp.exp(lp) * lp, axis=-1)

  def mode(self):
    return jnp.argmax(self.logits, axis=-1).astype(self.dtype)

  def mean(self):
    raise NotImplementedError("mean undefined for Categorical")

  def kl_divergence(self, other: "Categorical"):
    lp = self.log_probs
    return jnp.sum(jnp.exp(lp) * (lp - other.log_probs), axis=-1)


NEG_INF = -1e9


@struct.dataclass
class MaskedCategorical(Distribution):
  """Categorical with a boolean validity mask (reference masked.py:21)."""
  logits: Any
  mask: Any
  dtype: Any = struct.field(pytree_node=False, default=jnp.int32)

  @property
  def _masked(self) -> Categorical:
    logits = jnp.where(self.mask, self.logits, NEG_INF)
    return Categorical(logits, dtype=self.dtype)

  def sample(self, key, sample_shape=()):
    return self._masked.sample(key, sample_shape)

  def log_prob(self, value):
    return self._masked.log_prob(value)

  def entropy(self):
    # Zero out the -inf * 0 terms for fully-masked entries.
    lp = self._masked.log_probs
    p = jnp.exp(lp)
    return -jnp.sum(jnp.where(self.mask, p * lp, 0.0), axis=-1)

  def mode(self):
    return self._masked.mode()


@struct.dataclass
class ShiftedCategorical(Distribution):
  """Categorical over [shift, shift + K) (reference shifted_categorical.py)."""
  logits: Any
  shift: int = struct.field(pytree_node=False, default=0)
  dtype: Any = struct.field(pytree_node=False, default=jnp.int32)

  @property
  def _base(self):
    return Categorical(self.logits, dtype=self.dtype)

  def sample(self, key, sample_shape=()):
    return self._base.sample(key, sample_shape) + jnp.asarray(
        self.shift, self.dtype)

  def log_prob(self, value):
    return self._base.log_prob(value - self.shift)

  def entropy(self):
    return self._base.entropy()

  def mode(self):
    return self._base.mode() + jnp.asarray(self.shift, self.dtype)


@struct.dataclass
class OneHotCategorical(Distribution):
  logits: Any
  dtype: Any = struct.field(pytree_node=False, default=jnp.float32)

  def sample(self, key, sample_shape=()):
    idx = Categorical(self.logits).sample(key, sample_shape)
    return jax.nn.one_hot(idx, jnp.shape(self.logits)[-1], dtype=self.dtype)

  def log_prob(self, value):
    return jnp.sum(jax.nn.log_softmax(self.logits, -1) * value, axis=-1)

  def entropy(self):
    return Categorical(self.logits).entropy()

  def mode(self):
    return jax.nn.one_hot(
        jnp.argmax(self.logits, -1), jnp.shape(self.logits)[-1],
        dtype=self.dtype)


@struct.dataclass
class GumbelSoftmax(Distribution):
  """Concrete/Gumbel-Softmax relaxation (reference gumbel_softmax.py:26).

  `sample` returns relaxed one-hot vectors; `convert_to_one_hot` matches the
  reference's straight-through discretization.
  """
  logits: Any
  temperature: Any = 1.0
  dtype: Any = struct.field(pytree_node=False, default=jnp.float32)

  def sample(self, key, sample_shape=()):
    shape = tuple(sample_shape) + jnp.shape(self.logits)
    g = jax.random.gumbel(key, shape, jnp.result_type(self.logits))
    return jax.nn.softmax((self.logits + g) / self.temperature, axis=-1)

  def convert_to_one_hot(self, samples):
    idx = jnp.argmax(samples, axis=-1)
    hard = jax.nn.one_hot(idx, jnp.shape(self.logits)[-1], dtype=self.dtype)
    # Straight-through gradient: forward = hard, backward = identity.
    return jax.lax.stop_gradient(hard - samples) + samples

  def log_prob(self, value):
    # Log-prob of the underlying categorical at argmax (reference behavior).
    return Categorical(self.logits).log_prob(jnp.argmax(value, axis=-1))

  def entropy(self):
    return Categorical(self.logits).entropy()

  def mode(self):
    return jax.nn.one_hot(
        jnp.argmax(self.logits, -1), jnp.shape(self.logits)[-1],
        dtype=self.dtype)


@struct.dataclass
class Bernoulli(Distribution):
  logits: Any
  dtype: Any = struct.field(pytree_node=False, default=jnp.int32)

  @property
  def probs(self):
    return jax.nn.sigmoid(self.logits)

  def sample(self, key, sample_shape=()):
    shape = tuple(sample_shape) + jnp.shape(self.logits)
    return jax.random.bernoulli(key, self.probs, shape).astype(self.dtype)

  def log_prob(self, value):
    v = value.astype(self.logits.dtype)
    return v * jax.nn.log_sigmoid(self.logits) + (1 - v) * jax.nn.log_sigmoid(
        -self.logits)

  def entropy(self):
    p = self.probs
    return -(p * jax.nn.log_sigmoid(self.logits)
             + (1 - p) * jax.nn.log_sigmoid(-self.logits))

  def mode(self):
    return (self.logits > 0).astype(self.dtype)

  def mean(self):
    return self.probs


@struct.dataclass
class Beta(Distribution):
  """Beta(a, b) — used by Bernoulli-Thompson-sampling bandits."""
  concentration1: Any  # alpha
  concentration0: Any  # beta

  def sample(self, key, sample_shape=()):
    # Batch shape = broadcast of both concentrations (TFP semantics;
    # a scalar prior mixed with a per-arm array must draw per arm).
    batch = jnp.broadcast_shapes(jnp.shape(self.concentration1),
                                 jnp.shape(self.concentration0))
    return jax.random.beta(key, self.concentration1, self.concentration0,
                           tuple(sample_shape) + batch)

  def log_prob(self, value):
    a, b = self.concentration1, self.concentration0
    return ((a - 1) * jnp.log(value) + (b - 1) * jnp.log1p(-value)
            - (jax.scipy.special.betaln(a, b)))

  def mean(self):
    return self.concentration1 / (self.concentration1 + self.concentration0)

  def mode(self):
    a, b = self.concentration1, self.concentration0
    return (a - 1) / (a + b - 2)

  def entropy(self):
    a, b = self.concentration1, self.concentration0
    dg = jax.scipy.special.digamma
    return (jax.scipy.special.betaln(a, b) - (a - 1) * dg(a)
            - (b - 1) * dg(b) + (a + b - 2) * dg(a + b))


@struct.dataclass
class Deterministic(Distribution):
  loc: Any
  event_ndims: int = struct.field(pytree_node=False, default=0)

  def sample(self, key, sample_shape=()):
    del key
    return jnp.broadcast_to(
        self.loc, tuple(sample_shape) + jnp.shape(self.loc))

  def log_prob(self, value):
    eq = (value == self.loc)
    lp = jnp.where(eq, 0.0, -jnp.inf)
    if self.event_ndims:
      lp = jnp.sum(lp, axis=tuple(range(-self.event_ndims, 0)))
    return lp

  def entropy(self):
    shape = jnp.shape(self.loc)[:len(jnp.shape(self.loc)) - self.event_ndims]
    return jnp.zeros(shape)

  def mode(self):
    return self.loc

  def mean(self):
    return self.loc


def kl_divergence(d1, d2):
  return d1.kl_divergence(d2)
