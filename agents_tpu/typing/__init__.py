from agents_tpu.typing import types

__all__ = ["types"]
