from agents_tpu.utils import common, nest_utils, value_ops

__all__ = ["common", "nest_utils", "value_ops"]
