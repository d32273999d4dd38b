"""Trivial baseline agents (reference agents/random/*.py:75,104)."""
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from agents_tpu.agents.agent import Agent
from agents_tpu.policies.random_policy import RandomPolicy
from agents_tpu.utils.common import LossInfo


@struct.dataclass
class TrivialAgentState:
  train_step: jax.Array


class RandomAgent(Agent):
  """Acts randomly; train is a no-op counter."""

  def __init__(self, time_step_spec, action_spec):
    self.time_step_spec = time_step_spec
    self.action_spec = action_spec
    self.policy = RandomPolicy(time_step_spec, action_spec)
    self.collect_policy = self.policy
    self.train_sequence_length = None

  def init(self, key) -> TrivialAgentState:
    del key
    return TrivialAgentState(train_step=jnp.zeros((), jnp.int32))

  def policy_params(self, agent_state):
    return ()

  def train(self, agent_state, experience,
            weights=None) -> Tuple[TrivialAgentState, LossInfo]:
    del experience, weights
    return (TrivialAgentState(train_step=agent_state.train_step + 1),
            LossInfo(jnp.zeros(()), ()))


class FixedPolicyAgent(Agent):
  """Wraps any fixed policy as an agent (reference fixed_policy_agent)."""

  def __init__(self, time_step_spec, action_spec, policy):
    self.time_step_spec = time_step_spec
    self.action_spec = action_spec
    self.policy = policy
    self.collect_policy = policy
    self.train_sequence_length = None

  def init(self, key):
    del key
    return TrivialAgentState(train_step=jnp.zeros((), jnp.int32))

  def policy_params(self, agent_state):
    return ()

  def train(self, agent_state, experience, weights=None):
    del experience, weights
    return (TrivialAgentState(train_step=agent_state.train_step + 1),
            LossInfo(jnp.zeros(()), ()))
