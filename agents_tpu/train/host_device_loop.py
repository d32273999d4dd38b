"""Host-env + device-learner training loop (the MuJoCo/Atari path).

The reference's modern actor-learner stack (Actor/PyDriver collecting into
a Reverb C++ server, Learner draining it via tf.data —
SURVEY.md §3.2/§3.3) exists because TF needs a host-side buffer between
collection and training. Here the replay buffer LIVES ON THE DEVICE, so
the host's only job is stepping the C/C++ simulators: each loop tick makes
ONE fused device call that
  1. writes the previous transition batch into HBM replay,
  2. computes actions for the fresh observations,
  3. runs K gradient steps sampled from replay.
The action batch is the only device->host transfer per tick.

Throughput design for a 2-core host: env stepping uses a thread pool
(BatchedPyEnvironment; MuJoCo releases the GIL), and the device call is
dispatched immediately after actions are available so train compute
overlaps the next host step where the runtime allows.
"""
from __future__ import annotations

import time
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from agents_tpu.trajectories import policy_step as ps
from agents_tpu.trajectories import time_step as ts
from agents_tpu.trajectories import trajectory as tj


@struct.dataclass
class DeviceState:
  replay_state: Any
  agent_state: Any
  key: jax.Array


class HostDeviceTrainLoop:
  """Args:
    env: a batched host PyEnvironment (BatchedPyEnvironment / Parallel...).
    agent: agents_tpu Agent.
    replay: UniformReplay with batch_size == env.batch_size.
    train_steps_per_tick: gradient steps fused into each device call
      (UTD ratio = train_steps_per_tick / env.batch_size).
    sample_batch_size: replay sample per gradient step.
  """

  def __init__(self, env, agent, replay, train_steps_per_tick: int = 1,
               sample_batch_size: int = 256, py_metrics=()):
    self.env = env
    self.agent = agent
    self.replay = replay
    self.train_steps_per_tick = train_steps_per_tick
    self.sample_batch_size = sample_batch_size
    self.py_metrics = list(py_metrics)
    self._compiled_collect = jax.jit(self._device_collect_only,
                                     static_argnames=("insert",))
    self._compiled_insert = jax.jit(self._insert_only)
    self._compiled_step = jax.jit(self._device_step)

  # -- device programs -------------------------------------------------------
  def _insert_and_act(self, dev: DeviceState, host_time_step, prev_time_step,
                      prev_action):
    key, k_act = jax.random.split(dev.key)
    frame = tj.from_transition(
        prev_time_step, ps.PolicyStep(action=prev_action), host_time_step)
    replay_state = self.replay.add_batch(dev.replay_state, frame)
    params = self.agent.collect_policy_params(dev.agent_state)
    action_step = self.agent.collect_policy.action(
        params, host_time_step, (), k_act)
    return dev.replace(replay_state=replay_state, key=key), action_step

  def _device_collect_only(self, dev: DeviceState, host_time_step,
                           prev_time_step, prev_action, insert=True):
    # insert=False on the very first tick: there is no real previous
    # transition yet, and a from_transition(reset, zero_action, reset)
    # frame would plant a fabricated FIRST->FIRST self-transition in the
    # valid sampling window.
    if not insert:
      key, k_act = jax.random.split(dev.key)
      params = self.agent.collect_policy_params(dev.agent_state)
      action_step = self.agent.collect_policy.action(
          params, host_time_step, (), k_act)
      return dev.replace(key=key), action_step.action
    dev, action_step = self._insert_and_act(
        dev, host_time_step, prev_time_step, prev_action)
    return dev, action_step.action

  def _insert_only(self, dev: DeviceState, host_time_step, prev_time_step,
                   prev_action):
    # Random initial collect discards the policy's action, so this
    # program skips the policy forward pass and the action transfer
    # entirely — the full collect program wasted both on every warmup
    # tick (round-5 review).
    frame = tj.from_transition(
        prev_time_step, ps.PolicyStep(action=prev_action), host_time_step)
    return dev.replace(replay_state=self.replay.add_batch(
        dev.replay_state, frame))

  def _device_step(self, dev: DeviceState, host_time_step, prev_time_step,
                   prev_action):
    dev, action_step = self._insert_and_act(
        dev, host_time_step, prev_time_step, prev_action)
    key, k_sample = jax.random.split(dev.key)

    def train_once(agent_state, k):
      experience, _ = self.replay.sample(
          dev.replay_state, k, self.sample_batch_size,
          num_steps=self.agent.train_sequence_length)
      agent_state, loss_info = self.agent.train(agent_state, experience)
      return agent_state, loss_info.loss

    ks = jax.random.split(k_sample, self.train_steps_per_tick)
    agent_state, losses = jax.lax.scan(train_once, dev.agent_state, ks)
    return (dev.replace(agent_state=agent_state, key=key),
            action_step.action, losses[-1])

  # -- host loop ---------------------------------------------------------------
  def init(self, seed: int = 0) -> Tuple[DeviceState, ts.TimeStep]:
    agent_state = self.agent.init(jax.random.key(seed))
    dev = DeviceState(replay_state=self.replay.init(),
                      agent_state=agent_state,
                      key=jax.random.key(seed + 1))
    time_step = self.env.reset()
    return dev, time_step

  def _observe(self, prev_time_step, action, time_step):
    if not self.py_metrics:
      return
    frame = tj.from_transition(
        prev_time_step, ps.PolicyStep(action=action), time_step)
    for m in self.py_metrics:
      m(frame)

  def collect(self, dev: DeviceState, time_step, num_ticks: int,
              random: bool = True, seed: int = 0):
    """Initial collection (random actions like the reference's initial
    collect Actor)."""
    from agents_tpu.specs import array_spec
    rng = np.random.RandomState(seed)
    B = self.env.batch_size
    prev_action = array_spec.zero_spec_nest(
        self.agent.action_spec, outer_dims=(B,))
    prev_time_step = time_step
    for i in range(num_ticks):
      if random:
        # No policy involvement: insert the previous transition (tick 0
        # has none — no device call at all) and draw host random actions.
        if i > 0:
          dev = self._compiled_insert(dev, time_step, prev_time_step,
                                      prev_action)
        action = array_spec.np_sample_spec_nest(
            self.agent.action_spec, rng, outer_dims=(B,))
      else:
        dev, action = self._compiled_collect(
            dev, time_step, prev_time_step, prev_action, insert=i > 0)
        action = jax.tree_util.tree_map(np.asarray, action)
      next_time_step = self.env.step(action)
      self._observe(time_step, action, next_time_step)
      prev_time_step, prev_action = time_step, action
      time_step = next_time_step
    return dev, time_step, prev_time_step, prev_action

  def run(self, dev: DeviceState, time_step, prev_time_step, prev_action,
          num_ticks: int):
    """Main loop: each tick = one fused device call + one host env step."""
    last_loss = np.nan
    for i in range(num_ticks):
      dev, action, loss = self._compiled_step(
          dev, time_step, prev_time_step, prev_action)
      action = jax.tree_util.tree_map(np.asarray, action)
      next_time_step = self.env.step(action)
      self._observe(time_step, action, next_time_step)
      prev_time_step, prev_action = time_step, action
      time_step = next_time_step
      if i == num_ticks - 1:
        last_loss = float(np.asarray(loss))
    return dev, time_step, prev_time_step, prev_action, last_loss

  def metric_results(self):
    return {m.name: m.result() for m in self.py_metrics}
