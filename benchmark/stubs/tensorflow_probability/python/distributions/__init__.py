import tensorflow_probability as _tfp
Distribution = _tfp.Distribution
Categorical = _tfp.Categorical
Deterministic = _tfp.Deterministic
Bernoulli = _tfp.Bernoulli
def __getattr__(item):
  return getattr(_tfp.distributions, item)
