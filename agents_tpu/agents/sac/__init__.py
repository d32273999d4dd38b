from agents_tpu.agents.sac.sac_agent import SacAgent, SacAgentState

__all__ = ["SacAgent", "SacAgentState"]
