"""Minimal tensorflow_probability stub — just enough for the tf_agents
DQN CartPole path (q_policy Categorical, greedy Deterministic,
epsilon_greedy SeedStream/Bernoulli). Anything else resolves to inert
placeholder classes so module-level references don't explode at import.
"""
import hashlib

import tensorflow as tf


class _PlaceholderMeta(type):
  """Attribute access on a placeholder class yields another placeholder
  class, so chains like tfp.distributions.foo.Bar resolve at import time
  and `class X(tfp.distributions.Bar)` is legal."""

  def __getattr__(cls, item):
    if item.startswith("__"):
      raise AttributeError(item)
    ph = _PlaceholderMeta(f"{cls.__name__}.{item}", (cls,), {})
    setattr(cls, item, ph)
    return ph


class _Placeholder(metaclass=_PlaceholderMeta):
  """Stands in for any tfp symbol we don't implement."""

  def __init__(self, *a, **k):
    raise NotImplementedError(
        f"tfp stub placeholder {type(self).__name__} was instantiated")


class _LazyNamespace:
  def __init__(self, name, real=None):
    self._name = name
    self._real = real or {}

  def __getattr__(self, item):
    if item.startswith("__"):
      raise AttributeError(item)
    if item in self._real:
      return self._real[item]
    ph = _PlaceholderMeta(f"{self._name}.{item}", (_Placeholder,), {})
    self._real[item] = ph
    return ph


class Distribution:
  """Tiny base: subset of the tfp.distributions.Distribution surface used
  by tf_agents' q/greedy/epsilon-greedy policies."""

  def __init__(self, dtype=None, name=None, parameters=None):
    self._dtype = dtype
    self._name = name or type(self).__name__
    # tfp contract for tf_agents get_parameters (distributions/utils.py):
    # Mapping of ctor args, never containing 'self'.
    parameters = dict(parameters or {})
    parameters.pop("self", None)
    parameters.pop("__class__", None)
    self.parameters = parameters

  @property
  def dtype(self):
    return self._dtype

  @property
  def name(self):
    return self._name

  def event_shape_tensor(self, name="event_shape_tensor"):
    return tf.constant([], tf.int32)

  @property
  def event_shape(self):
    # Static event shape derived from the (eagerly computable) tensor
    # version; network spec inference runs eagerly at build time.
    try:
      return tf.TensorShape(
          [int(v) for v in self.event_shape_tensor().numpy()])
    except Exception:
      return tf.TensorShape([])

  def batch_shape_tensor(self, name="batch_shape_tensor"):
    return tf.constant([], tf.int32)

  @property
  def batch_shape(self):
    try:
      return tf.TensorShape(
          [int(v) for v in self.batch_shape_tensor().numpy()])
    except Exception:
      return tf.TensorShape(None)

  def sample(self, sample_shape=(), seed=None, **kwargs):
    raise NotImplementedError

  def mode(self, **kwargs):
    raise NotImplementedError


class Categorical(Distribution):

  def __init__(self, logits=None, probs=None, dtype=tf.int32, name=None):
    super().__init__(dtype=dtype, name=name)
    self._logits = logits
    self._probs = probs

  @property
  def logits(self):
    return self._logits

  @property
  def probs(self):
    return self._probs

  def _rank1_logits(self):
    logits = self._logits
    if logits is None:
      logits = tf.math.log(self._probs)
    return logits

  def sample(self, sample_shape=(), seed=None, **kwargs):
    logits = self._rank1_logits()
    shape = tf.shape(logits)
    flat = tf.reshape(logits, [-1, shape[-1]])
    s = tf.random.categorical(flat, 1, seed=seed)
    s = tf.reshape(s, shape[:-1])
    return tf.cast(s, self._dtype)

  def mode(self, **kwargs):
    return tf.cast(tf.argmax(self._rank1_logits(), axis=-1), self._dtype)


class Deterministic(Distribution):

  def __init__(self, loc, name=None):
    super().__init__(dtype=loc.dtype if hasattr(loc, "dtype") else None,
                     name=name)
    self.loc = loc

  def sample(self, sample_shape=(), seed=None, **kwargs):
    return self.loc

  def mode(self, **kwargs):
    return self.loc

  def log_prob(self, value, **kwargs):
    return tf.zeros_like(tf.cast(value, tf.float32))


class Bernoulli(Distribution):

  def __init__(self, probs=None, logits=None, dtype=tf.int32, name=None):
    super().__init__(dtype=dtype, name=name)
    self._probs = probs if probs is not None else tf.sigmoid(logits)

  def sample(self, sample_shape=(), seed=None, **kwargs):
    p = tf.convert_to_tensor(self._probs, tf.float32)
    shape = tuple(sample_shape) + tuple(p.shape)
    u = tf.random.stateless_uniform(shape, seed=[seed or 0, 17]) \
        if False else tf.random.uniform(shape, seed=seed)
    return tf.cast(u < p, self._dtype)


class _ReparameterizationType:
  def __init__(self, rep):
    self._rep = rep

  def __repr__(self):
    return self._rep


FULLY_REPARAMETERIZED = _ReparameterizationType("FULLY_REPARAMETERIZED")
NOT_REPARAMETERIZED = _ReparameterizationType("NOT_REPARAMETERIZED")

import math as _math
_LOG_2PI = _math.log(2.0 * _math.pi)


class Normal(Distribution):
  """Real diagonal-free scalar normal: reparameterized sample, exact
  log_prob/entropy (what the reference SAC actor/alpha losses consume)."""

  def __init__(self, loc, scale, validate_args=False, allow_nan_stats=True,
               name="Normal"):
    parameters = dict(locals())
    loc = tf.convert_to_tensor(loc)
    super().__init__(dtype=loc.dtype, name=name, parameters=parameters)
    self.loc = loc
    self.scale = tf.convert_to_tensor(scale, loc.dtype)
    self.reparameterization_type = FULLY_REPARAMETERIZED
    self.allow_nan_stats = allow_nan_stats
    self._graph_parents = []

  def _batch_shape(self):
    return tf.broadcast_dynamic_shape(tf.shape(self.loc),
                                      tf.shape(self.scale))

  def sample(self, sample_shape=(), seed=None, name="sample", **kwargs):
    if isinstance(sample_shape, int):
      sample_shape = (sample_shape,)
    shape = tf.concat(
        [tf.convert_to_tensor(sample_shape, tf.int32), self._batch_shape()],
        axis=0)
    eps = tf.random.normal(shape, dtype=self.loc.dtype, seed=seed)
    return self.loc + self.scale * eps

  def log_prob(self, x, name="log_prob", **kwargs):
    z = (tf.cast(x, self.loc.dtype) - self.loc) / self.scale
    return -0.5 * tf.square(z) - tf.math.log(self.scale) \
        - 0.5 * tf.cast(_LOG_2PI, self.loc.dtype)

  def prob(self, x, name="prob", **kwargs):
    return tf.exp(self.log_prob(x))

  def mode(self, **kwargs):
    return self.loc

  def mean(self, **kwargs):
    return self.loc

  def stddev(self, **kwargs):
    return tf.broadcast_to(self.scale, self._batch_shape())

  def entropy(self, **kwargs):
    return 0.5 + 0.5 * tf.cast(_LOG_2PI, self.loc.dtype) \
        + tf.math.log(tf.broadcast_to(self.scale, self._batch_shape()))

  def kl_divergence(self, other, name="kl_divergence"):
    va, vb = tf.square(self.scale), tf.square(other.scale)
    return (tf.math.log(other.scale) - tf.math.log(self.scale)
            + (va + tf.square(self.loc - other.loc)) / (2.0 * vb) - 0.5)


class MultivariateNormalDiag(Distribution):
  """Diagonal MVN over the LAST axis (event_ndims=1)."""

  def __init__(self, loc=None, scale_diag=None, validate_args=False,
               allow_nan_stats=True, name="MultivariateNormalDiag"):
    parameters = dict(locals())
    loc = tf.convert_to_tensor(loc)
    super().__init__(dtype=loc.dtype, name=name, parameters=parameters)
    self.loc = loc
    self.scale_diag = tf.convert_to_tensor(scale_diag, loc.dtype)
    self.reparameterization_type = FULLY_REPARAMETERIZED
    self.allow_nan_stats = allow_nan_stats
    self._graph_parents = []
    self._marginal = Normal(loc, self.scale_diag)

  def sample(self, sample_shape=(), seed=None, name="sample", **kwargs):
    return self._marginal.sample(sample_shape, seed=seed)

  def log_prob(self, x, name="log_prob", **kwargs):
    return tf.reduce_sum(self._marginal.log_prob(x), axis=-1)

  def prob(self, x, name="prob", **kwargs):
    return tf.exp(self.log_prob(x))

  def mode(self, **kwargs):
    return self.loc

  def mean(self, **kwargs):
    return self.loc

  def stddev(self, **kwargs):
    return self._marginal.stddev()

  def entropy(self, **kwargs):
    return tf.reduce_sum(self._marginal.entropy(), axis=-1)

  def event_shape_tensor(self, name="event_shape_tensor"):
    return tf.shape(self.loc)[-1:]

  def batch_shape_tensor(self, name="batch_shape_tensor"):
    return self._marginal._batch_shape()[:-1]


class TransformedDistribution(Distribution):
  """Y = bijector.forward(X): exact change-of-variables log_prob."""

  def __init__(self, distribution=None, bijector=None, validate_args=False,
               name=None):
    parameters = dict(locals())
    super().__init__(dtype=distribution.dtype,
                     name=name or "TransformedDistribution",
                     parameters=parameters)
    self.distribution = distribution
    self.bijector = bijector
    self._event_ndims = (
        1 if isinstance(distribution, MultivariateNormalDiag) else 0)
    self.reparameterization_type = getattr(
        distribution, "reparameterization_type", FULLY_REPARAMETERIZED)
    self._graph_parents = []

  def sample(self, sample_shape=(), seed=None, name="sample", **kwargs):
    return self.bijector.forward(
        self.distribution.sample(sample_shape, seed=seed))

  def log_prob(self, y, name="log_prob", **kwargs):
    x = self.bijector.inverse(y)
    return self.distribution.log_prob(x) - \
        self.bijector.forward_log_det_jacobian(x, self._event_ndims)

  def prob(self, y, name="prob", **kwargs):
    return tf.exp(self.log_prob(y))

  def event_shape_tensor(self, name="event_shape_tensor"):
    return self.distribution.event_shape_tensor()

  def batch_shape_tensor(self, name="batch_shape_tensor"):
    return self.distribution.batch_shape_tensor()


class AutoCompositeTensorDistribution(Distribution):
  """Plain base (no CompositeTensor machinery): distributions in the
  baseline path are built and consumed inside one traced function, so the
  flatten/pack protocol is never exercised."""

  def __init__(self, dtype=None, reparameterization_type=None,
               validate_args=False, allow_nan_stats=True, parameters=None,
               graph_parents=None, name=None):
    super().__init__(dtype=dtype, name=name, parameters=parameters)
    self.reparameterization_type = reparameterization_type
    self.allow_nan_stats = allow_nan_stats
    self._graph_parents = list(graph_parents or [])


class SeedStream:
  """Deterministic int-seed stream (tfp.util.SeedStream semantics)."""

  def __init__(self, seed=None, salt=""):
    self._seed = seed
    self._salt = salt
    self._counter = 0

  def __call__(self):
    if self._seed is None:
      return None
    self._counter += 1
    h = hashlib.sha256(
        f"{self._seed}:{self._salt}:{self._counter}".encode()).digest()
    return int.from_bytes(h[:4], "little")

  @property
  def original_seed(self):
    return self._seed


def auto_composite_tensor(cls=None, **kwargs):
  if cls is None:
    return lambda c: c
  return cls


distributions = _LazyNamespace("tfp.distributions", {
    "Distribution": Distribution,
    "Categorical": Categorical,
    "Deterministic": Deterministic,
    "Bernoulli": Bernoulli,
    "Normal": Normal,
    "MultivariateNormalDiag": MultivariateNormalDiag,
    "TransformedDistribution": TransformedDistribution,
    "AutoCompositeTensorDistribution": AutoCompositeTensorDistribution,
    "FULLY_REPARAMETERIZED": FULLY_REPARAMETERIZED,
    "NOT_REPARAMETERIZED": NOT_REPARAMETERIZED,
})
util = _LazyNamespace("tfp.util", {"SeedStream": SeedStream})
experimental = _LazyNamespace("tfp.experimental", {
    "auto_composite_tensor": auto_composite_tensor,
    "AutoCompositeTensor": object,
})
from tensorflow_probability.python.bijectors import bijector as _bijector_mod
bijectors = _LazyNamespace("tfp.bijectors", {
    "Bijector": _bijector_mod.Bijector,
    "Shift": _bijector_mod.Shift,
    "Scale": _bijector_mod.Scale,
    "Chain": _bijector_mod.Chain,
})
layers = _LazyNamespace("tfp.layers")
stats = _LazyNamespace("tfp.stats")
math = _LazyNamespace("tfp.math")

__version__ = "0.0.0-stub"
