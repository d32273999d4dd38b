def __getattr__(item):
  class _Stub:
    pass
  return _Stub
