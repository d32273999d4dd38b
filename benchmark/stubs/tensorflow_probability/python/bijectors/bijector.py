"""Real (minimal) bijector protocol for the reference-SAC baseline path.

The reference's stable Tanh bijector (tf_agents/distributions/
tanh_bijector_stable.py) subclasses this base and supplies
_forward/_inverse/_forward_log_det_jacobian; SquashToSpecNormal chains it
with Shift/Scale. Everything here is elementwise (scalar event), which is
all that chain needs; `event_ndims` on the public log-det methods reduces
over that many trailing dimensions.
"""
import tensorflow as tf


class Bijector:

  def __init__(self, forward_min_event_ndims=0, validate_args=False,
               name="bijector", parameters=None, **kwargs):
    self._name = name
    self.validate_args = validate_args
    self.graph_parents = []
    # tfp contract consumed by tf_agents' get_parameters
    # (tf_agents/distributions/utils.py:273-320): a Mapping of ctor args
    # WITHOUT 'self' (a leaked self makes that walker recurse forever).
    parameters = dict(parameters or {})
    parameters.pop("self", None)
    parameters.pop("__class__", None)
    self.parameters = parameters

  @property
  def name(self):
    return self._name

  # Subclass hooks ---------------------------------------------------------
  def _forward(self, x):
    raise NotImplementedError

  def _inverse(self, y):
    raise NotImplementedError

  def _forward_log_det_jacobian(self, x):
    raise NotImplementedError

  # Public surface ---------------------------------------------------------
  def forward(self, x, name="forward"):
    return self._forward(x)

  def inverse(self, y, name="inverse"):
    return self._inverse(y)

  @staticmethod
  def _reduce(ldj, event_ndims):
    for _ in range(int(event_ndims)):
      ldj = tf.reduce_sum(ldj, axis=-1)
    return ldj

  def forward_log_det_jacobian(self, x, event_ndims=0,
                               name="forward_log_det_jacobian"):
    return self._reduce(self._forward_log_det_jacobian(x), event_ndims)

  def inverse_log_det_jacobian(self, y, event_ndims=0,
                               name="inverse_log_det_jacobian"):
    x = self._inverse(y)
    return -self.forward_log_det_jacobian(x, event_ndims)

  def __call__(self, other):
    """tfp composition syntax: Shift(m)(Scale(s)) is Shift after Scale."""
    if isinstance(other, Bijector):
      return Chain([self, other])
    raise TypeError(f"cannot apply bijector to {type(other)}")


class Shift(Bijector):

  def __init__(self, shift, name="shift"):
    super().__init__(name=name)
    self.shift = tf.convert_to_tensor(shift)

  def _forward(self, x):
    return x + self.shift

  def _inverse(self, y):
    return y - self.shift

  def _forward_log_det_jacobian(self, x):
    return tf.zeros_like(x)


class Scale(Bijector):

  def __init__(self, scale, name="scale"):
    super().__init__(name=name)
    self.scale = tf.convert_to_tensor(scale)

  def _forward(self, x):
    return x * self.scale

  def _inverse(self, y):
    return y / self.scale

  def _forward_log_det_jacobian(self, x):
    return tf.broadcast_to(
        tf.math.log(tf.abs(tf.cast(self.scale, x.dtype))), tf.shape(x))


class Chain(Bijector):
  """Chain([f, g]).forward(x) == f.forward(g.forward(x)) (tfp order)."""

  def __init__(self, bijectors, name="chain"):
    super().__init__(name=name)
    self.bijectors = list(bijectors)

  def _forward(self, x):
    for b in reversed(self.bijectors):
      x = b.forward(x)
    return x

  def _inverse(self, y):
    for b in self.bijectors:
      y = b.inverse(y)
    return y

  def _forward_log_det_jacobian(self, x):
    ldj = tf.zeros_like(x)
    for b in reversed(self.bijectors):
      ldj = ldj + b._forward_log_det_jacobian(x)  # all elementwise here
      x = b.forward(x)
    return ldj
