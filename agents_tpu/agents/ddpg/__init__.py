from agents_tpu.agents.ddpg.ddpg_agent import DdpgAgent, DdpgAgentState

__all__ = ["DdpgAgent", "DdpgAgentState"]
