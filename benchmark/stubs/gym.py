"""gym stub for import-compat: re-export gymnasium's surface."""
from gymnasium import *  # noqa
import gymnasium as _g
Env = _g.Env
Wrapper = _g.Wrapper
spaces = _g.spaces
__version__ = "0.23.0"
