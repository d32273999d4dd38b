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

  def __init__(self, dtype=None, name=None):
    self._dtype = dtype
    self._name = name or type(self).__name__

  @property
  def dtype(self):
    return self._dtype

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
})
util = _LazyNamespace("tfp.util", {"SeedStream": SeedStream})
experimental = _LazyNamespace("tfp.experimental", {
    "auto_composite_tensor": auto_composite_tensor,
    "AutoCompositeTensor": object,
})
bijectors = _LazyNamespace("tfp.bijectors")
layers = _LazyNamespace("tfp.layers")
stats = _LazyNamespace("tfp.stats")
math = _LazyNamespace("tfp.math")

__version__ = "0.0.0-stub"
