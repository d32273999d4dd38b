"""Agent base: pure train steps over explicit state.

TPU-native analogue of ``tf_agents/agents/tf_agent.py:41``. An Agent is a
factory of pure functions:

    agent_state = agent.init(key)                       # params/opt/step
    agent_state, loss_info = agent.train(agent_state, experience)
    step = agent.policy.action(agent.policy_params(agent_state), ...)

`train` is jit-safe: call it inside your own jit, or use
``jax.jit(agent.train)``. `experience` is a Trajectory pytree shaped
``[B, T, ...]`` (the reference's data_converter contract); agents convert
internally like `AsTransition`/`AsNStepTransition` (data_converter.py:377,
577).
"""
from __future__ import annotations

import abc
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from agents_tpu.utils.common import LossInfo


class Agent(abc.ABC):
  """Base agent.

  Attributes (set by subclasses):
    time_step_spec / action_spec: environment interface specs.
    policy: eval/deployment policy.
    collect_policy: exploration policy.
    train_sequence_length: required T of training trajectories (or None).
  """

  time_step_spec = None
  action_spec = None
  policy = None
  collect_policy = None
  train_sequence_length: Optional[int] = None

  @abc.abstractmethod
  def init(self, key) -> Any:
    """Create the initial agent state (params, target params, opt state,
    train_step counter)."""

  @abc.abstractmethod
  def train(self, agent_state, experience) -> Tuple[Any, LossInfo]:
    """One gradient step; returns (new_state, LossInfo)."""

  def loss(self, agent_state, experience) -> LossInfo:
    """Loss without applying gradients (reference TFAgent.loss :360)."""
    _, info = self.train(agent_state, experience)
    return info

  # -- policy parameter accessors ------------------------------------------
  def policy_params(self, agent_state):
    """Parameters consumed by `self.policy` (greedy/eval)."""
    return agent_state.params

  def collect_policy_params(self, agent_state):
    """Parameters consumed by `self.collect_policy`. Defaults to
    `policy_params`; agents whose collect policies depend on extra state
    (e.g. train_step-driven exploration schedules: FALCON, decayed
    epsilon-greedy) override this."""
    return self.policy_params(agent_state)

  def preprocess_sequence(self, agent_state, experience):
    """Optional experience preprocessing hook (tf_agent.py:286)."""
    return experience
