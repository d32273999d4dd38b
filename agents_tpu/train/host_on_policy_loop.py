"""On-policy training over host environments (PPO on MuJoCo).

Analogue of the reference's PPO actor-learner path
(``examples/ppo/schulman17/train_eval_lib.py:85`` — Actors filling two
Reverb FIFO tables, PPOLearner draining them): here the host loop steps
the simulators with the jitted collect policy, keeps the rollout ON
DEVICE (policy outputs — actions, value predictions, distribution
parameters — never leave HBM; only actions transfer out for the
simulators), then hands the stacked [B, T] rollout to `agent.train`'s
fused epoch/minibatch program.
"""
from __future__ import annotations

import time
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from agents_tpu.trajectories import policy_step as ps
from agents_tpu.trajectories import time_step as ts
from agents_tpu.trajectories import trajectory as tj


class HostOnPolicyTrainLoop:

  def __init__(self, env, agent, rollout_length: int = 128, py_metrics=()):
    self.env = env
    self.agent = agent
    self.rollout_length = rollout_length
    self.py_metrics = list(py_metrics)
    self._policy_fn = jax.jit(
        lambda p, t, k: agent.collect_policy.action(p, t, (), k))
    self._train_fn = jax.jit(agent.train)

  def init(self, seed: int = 0):
    agent_state = self.agent.init(jax.random.key(seed))
    time_step = self.env.reset()
    return agent_state, time_step

  def run_iteration(self, agent_state, time_step, key):
    """Collect rollout_length host steps, then one fused PPO update."""
    params = self.agent.collect_policy_params(agent_state)
    frames = []
    for t in range(self.rollout_length):
      key, sub = jax.random.split(key)
      astep = self._policy_fn(params, time_step, sub)
      action_np = jax.tree_util.tree_map(np.asarray, astep.action)
      next_time_step = self.env.step(action_np)
      frame = tj.from_transition(
          jax.tree_util.tree_map(jnp.asarray, time_step),
          astep, jax.tree_util.tree_map(jnp.asarray, next_time_step))
      frames.append(frame)
      if self.py_metrics:
        host_frame = tj.from_transition(
            time_step, ps.PolicyStep(action=action_np), next_time_step)
        for m in self.py_metrics:
          m(host_frame)
      time_step = next_time_step

    experience = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=1), *frames)  # [B, T, ...]
    key, sub = jax.random.split(key)
    agent_state, loss_info = self._train_fn(agent_state, experience,
                                            key=sub)
    return agent_state, time_step, key, loss_info

  def metric_results(self):
    return {m.name: m.result() for m in self.py_metrics}
