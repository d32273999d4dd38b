from agents_tpu.agents.random.random_agent import FixedPolicyAgent, RandomAgent

__all__ = ["FixedPolicyAgent", "RandomAgent"]
