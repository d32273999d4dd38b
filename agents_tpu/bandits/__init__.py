"""Contextual-bandits vertical (analogue of tf_agents/bandits)."""
