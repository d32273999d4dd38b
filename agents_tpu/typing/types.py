"""Common type aliases.

Analogue of the reference's ``tf_agents/typing/types.py``. Nested structures
are JAX pytrees rather than tf.nest structures.
"""
from __future__ import annotations

from typing import Any, Callable, Iterable, Mapping, Optional, Sequence, Union

import jax
import numpy as np

# A JAX array or anything convertible (host numpy arrays cross the boundary).
Array = Union[jax.Array, np.ndarray]
Scalar = Union[int, float, bool]
Int = Union[int, np.integer, jax.Array]
Float = Union[float, np.floating, jax.Array]
Bool = Union[bool, np.bool_, jax.Array]

PRNGKey = jax.Array
Shape = Sequence[int]
DType = Any

# Pytrees ("nests" in the reference's vocabulary).
Nested = Any
NestedArray = Any
NestedSpec = Any
NestedDistribution = Any

Seed = Union[int, PRNGKey]

Splitter = Optional[Callable[[NestedArray], tuple]]
LossFn = Callable[..., Any]
