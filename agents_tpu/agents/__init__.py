from agents_tpu.agents.agent import Agent

__all__ = ["Agent"]
