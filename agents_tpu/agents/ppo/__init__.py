from agents_tpu.agents.ppo.ppo_agent import PPOAgent, PPOAgentState
from agents_tpu.agents.ppo.ppo_policy import PPOPolicy

__all__ = ["PPOAgent", "PPOAgentState", "PPOPolicy"]
from agents_tpu.agents.ppo.ppo_variants import PPOClipAgent, PPOKLPenaltyAgent

__all__ += ["PPOClipAgent", "PPOKLPenaltyAgent"]
