from agents_tpu.agents.categorical_dqn.categorical_dqn_agent import (
    CategoricalDqnAgent,
    project_distribution,
)

__all__ = ["CategoricalDqnAgent", "project_distribution"]
