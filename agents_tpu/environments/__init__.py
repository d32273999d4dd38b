from agents_tpu.environments.jax_environment import (
    BatchedJaxEnv,
    JaxEnvironment,
)
from agents_tpu.environments.jax_wrappers import (
    JaxEnvironmentWrapper,
    OneHotActionJaxWrapper,
)

__all__ = [
    "BatchedJaxEnv",
    "JaxEnvironment",
    "JaxEnvironmentWrapper",
    "OneHotActionJaxWrapper",
]
