"""Minimal gin-config stub: passthrough decorators, enough for import."""


class _Required:
  def __repr__(self):
    return "gin.REQUIRED"


REQUIRED = _Required()


def configurable(fn_or_name=None, *args, **kwargs):
  if callable(fn_or_name):
    return fn_or_name
  def deco(fn):
    return fn
  return deco


def register(fn_or_name=None, *args, **kwargs):
  return configurable(fn_or_name, *args, **kwargs)


def external_configurable(fn, *args, **kwargs):
  return fn


def constant(name, value):
  return value


def parse_config(*args, **kwargs):
  pass


def parse_config_files_and_bindings(*args, **kwargs):
  pass


def operative_config_str():
  return ""


def query_parameter(name):
  raise ValueError(f"gin stub: no parameter {name}")


class config_scope:
  def __init__(self, *a, **k):
    pass

  def __enter__(self):
    return self

  def __exit__(self, *a):
    return False


class config:
  @staticmethod
  def external_configurable(fn, *a, **k):
    return fn
