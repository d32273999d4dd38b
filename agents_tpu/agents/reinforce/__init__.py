from agents_tpu.agents.reinforce.reinforce_agent import (
    ReinforceAgent,
    ReinforceAgentState,
)

__all__ = ["ReinforceAgent", "ReinforceAgentState"]
