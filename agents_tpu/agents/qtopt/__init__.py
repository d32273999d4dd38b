from agents_tpu.agents.qtopt.qtopt_agent import QtOptAgent, QtOptAgentState

__all__ = ["QtOptAgent", "QtOptAgentState"]
