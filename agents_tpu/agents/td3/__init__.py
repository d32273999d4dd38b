from agents_tpu.agents.td3.td3_agent import Td3Agent, Td3AgentState

__all__ = ["Td3Agent", "Td3AgentState"]
