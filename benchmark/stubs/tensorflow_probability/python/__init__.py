from tensorflow_probability.python import bijectors, distributions, util, internal
