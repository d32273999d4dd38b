import tensorflow_probability as _tfp
SeedStream = _tfp.SeedStream
def __getattr__(item):
  return getattr(_tfp.util, item)
