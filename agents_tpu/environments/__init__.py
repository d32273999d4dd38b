from agents_tpu.environments.jax_environment import (
    BatchedJaxEnv,
    JaxEnvironment,
)

__all__ = ["BatchedJaxEnv", "JaxEnvironment"]
