from agents_tpu.agents.dqn.dqn_agent import D3qnAgent, DdqnAgent, DqnAgent

__all__ = ["D3qnAgent", "DdqnAgent", "DqnAgent"]
