class Bijector:
  def __init__(self, forward_min_event_ndims=0, validate_args=False,
               name="bijector", **kwargs):
    self._name = name
    self.validate_args = validate_args

  @property
  def name(self):
    return self._name
