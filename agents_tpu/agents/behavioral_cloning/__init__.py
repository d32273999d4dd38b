from agents_tpu.agents.behavioral_cloning.behavioral_cloning_agent import (
    BcAgentState,
    BehavioralCloningAgent,
)

__all__ = ["BcAgentState", "BehavioralCloningAgent"]
