"""Actor policy: network -> distribution -> PolicyStep.

Analogue of ``tf_agents/policies/actor_policy.py`` including the optional
observation normalizer hookup.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax

from agents_tpu.policies.policy import Policy
from agents_tpu.trajectories import policy_step as ps


class ActorPolicy(Policy):

  def __init__(self, time_step_spec, action_spec, actor_network,
               info_spec=(), observation_normalizer=None,
               training: bool = False, emit_log_probability: bool = False,
               clip: bool = True):
    super().__init__(time_step_spec, action_spec, info_spec=info_spec,
                     state_spec=actor_network.state_spec,
                     emit_log_probability=emit_log_probability, clip=clip)
    self.actor_network = actor_network
    self.observation_normalizer = observation_normalizer

  def _distribution(self, params, time_step, state):
    obs = time_step.observation
    if self.observation_normalizer is not None:
      # params carries the normalizer state under 'normalizer' when used
      # by PPO; standalone use passes it via functools.partial.
      norm_state = params.get("normalizer") if isinstance(params, dict) else None
      if norm_state is not None:
        obs = self.observation_normalizer.normalize(norm_state, obs)
        params = params["network"]
    dist, new_state = self.actor_network.apply(
        params, obs, time_step.step_type, state)
    return ps.PolicyStep(action=dist, state=new_state, info=())


class DeterministicActorPolicy(Policy):
  """For DDPG/TD3 actors that emit actions directly."""

  def __init__(self, time_step_spec, action_spec, actor_network,
               clip: bool = True):
    super().__init__(time_step_spec, action_spec,
                     state_spec=actor_network.state_spec, clip=clip)
    self.actor_network = actor_network

  def _action(self, params, time_step, state, key):
    del key
    action, new_state = self.actor_network.apply(
        params, time_step.observation, time_step.step_type, state)
    return ps.PolicyStep(action=action, state=new_state, info=())

  def _distribution(self, params, time_step, state):
    from agents_tpu import distributions as dist_lib
    action, new_state = self.actor_network.apply(
        params, time_step.observation, time_step.step_type, state)
    dist = dist_lib.Deterministic(action, event_ndims=1)
    return ps.PolicyStep(action=dist, state=new_state, info=())
