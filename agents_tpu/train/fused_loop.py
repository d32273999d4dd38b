"""The fused on-device training iteration.

This is the TPU-native answer to the reference's classic train_eval loop
(``tf_agents/agents/dqn/examples/v2/train_eval.py:291``): where the
reference alternates a graph-mode collect driver, a tf.data iterator, and
an agent.train tf.function — with host round-trips between each — here
one jitted `iteration` does

    collect (lax.scan over env+policy)
    -> replay insert (dynamic-update-slice)
    -> replay sample (gather)
    -> agent.train (grad + optimizer + target update)
    -> metric updates

entirely in HBM. `run(num_iterations)` wraps iterations in another
lax.scan so an arbitrary number of train iterations executes as ONE
device program (the analogue of Learner.run(iterations=N),
train/learner.py:310, without any host involvement).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from agents_tpu.drivers.jax_driver import DriverState, JaxDriver
from agents_tpu.replay_buffers.uniform_replay import UniformReplay
from agents_tpu.utils.common import LossInfo


@struct.dataclass
class LoopState:
  driver_state: DriverState
  replay_state: Any
  agent_state: Any
  metric_states: Any
  key: jax.Array


class FusedTrainLoop:
  """collect -> insert -> sample -> train as one jitted iteration.

  Args:
    env: BatchedJaxEnv.
    agent: an Agent (collect_policy drives collection).
    replay: UniformReplay storing Trajectory frames.
    metrics: sequence of jax_metrics.Metric updated during collection.
    collect_steps_per_iteration: driver scan length per iteration.
    sample_batch_size: replay sample size for training.
    train_steps_per_iteration: gradient steps per iteration.
  """

  def __init__(self, env, agent, replay: UniformReplay, metrics=(),
               collect_steps_per_iteration: int = 1,
               sample_batch_size: int = 64,
               train_steps_per_iteration: int = 1,
               per_beta: float = 0.4,
               mesh=None, data_axis: str = "data"):
    self.env = env
    self.agent = agent
    self.replay = replay
    self.metrics = tuple(metrics)
    self.collect_steps = collect_steps_per_iteration
    self.sample_batch_size = sample_batch_size
    self.train_steps = train_steps_per_iteration
    # Multi-device: with replay storage sharded P(None, data_axis) (see
    # parallel.shard_loop_state), plain global sampling makes GSPMD
    # all-gather the WHOLE buffer every iteration. Passing the mesh
    # routes sampling through replay.sample_sharded (shard-local
    # gathers, batch stays sharded on data_axis).
    self.mesh = mesh
    self.data_axis = data_axis
    # Prioritized replay plugs in transparently: IS weights feed
    # agent.train and TD errors flow back as new priorities.
    self.prioritized = hasattr(replay, "update_priorities")
    self.per_beta = per_beta
    observers = [self.replay.add_batch] + [m.update for m in self.metrics]
    self.driver = JaxDriver(env, agent.collect_policy, observers=observers)

  # -- lifecycle -----------------------------------------------------------
  def init(self, key, initial_collect_steps: int = 0) -> LoopState:
    k_agent, k_driver, k_collect, k_loop = jax.random.split(key, 4)
    agent_state = self.agent.init(k_agent)
    driver_state = self.driver.init(k_driver)
    replay_state = self.replay.init()
    metric_states = tuple(
        m.init(self.env.batch_size) for m in self.metrics)
    state = LoopState(driver_state=driver_state, replay_state=replay_state,
                      agent_state=agent_state, metric_states=metric_states,
                      key=k_loop)
    if initial_collect_steps:
      state = self.initial_collect(state, k_collect, initial_collect_steps)
    return state

  def initial_collect(self, state: LoopState, key,
                      num_steps: int) -> LoopState:
    """Seed replay with the collect policy (the reference uses a random
    policy; epsilon-greedy at init is equivalently random for fresh nets)."""
    params = self.agent.collect_policy_params(state.agent_state)
    obs_states = (state.replay_state,) + state.metric_states
    driver_state, obs_states = self.driver.run(
        params, state.driver_state, obs_states, key, num_steps)
    return state.replace(driver_state=driver_state,
                         replay_state=obs_states[0],
                         metric_states=tuple(obs_states[1:]))

  # -- one iteration ---------------------------------------------------------
  def iteration(self, state: LoopState, _=None) -> Tuple[LoopState, LossInfo]:
    key, k_collect, k_sample = jax.random.split(state.key, 3)
    params = self.agent.collect_policy_params(state.agent_state)
    obs_states = (state.replay_state,) + state.metric_states
    driver_state, obs_states = self.driver.run(
        params, state.driver_state, obs_states, k_collect,
        self.collect_steps)
    replay_state = obs_states[0]
    metric_states = tuple(obs_states[1:])

    def train_once(carry, k):
      agent_state, replay_state = carry
      if self.prioritized:
        if self.mesh is not None:
          # Same routing as the uniform branch below: shard-local
          # inverse-CDF sampling, else GSPMD all-gathers the whole
          # sharded buffer every gradient step.
          experience, info = self.replay.sample_sharded(
              replay_state, k, self.sample_batch_size, self.mesh,
              num_steps=self.agent.train_sequence_length,
              beta=self.per_beta, axis_name=self.data_axis)
        else:
          experience, info = self.replay.sample(
              replay_state, k, self.sample_batch_size,
              num_steps=self.agent.train_sequence_length,
              beta=self.per_beta)
        agent_state, loss_info = self.agent.train(
            agent_state, experience, weights=info.is_weights)
        td = getattr(loss_info.extra, "td_error", None)
        if td is None:
          # Trace-time check (this branch runs once, at trace): without a
          # td_error the loop can never refresh priorities — every item
          # keeps its insert-time max priority while beta-scaled IS
          # weights still distort the loss, i.e. PER silently degrades
          # to a slightly-biased uniform sampler.
          import warnings
          warnings.warn(
              f"PrioritizedReplay paired with "
              f"{type(self.agent).__name__}, whose LossInfo.extra has no "
              "td_error field: priorities will never be updated. Use "
              "UniformReplay, or expose td_error in the agent's loss "
              "extras.", stacklevel=2)
        else:
          if td.ndim > 1:  # sequence losses: [S, T-1] -> per-item scalar
            td = jnp.mean(jnp.abs(td),
                          axis=tuple(range(1, td.ndim)))
          replay_state = self.replay.update_priorities(
              replay_state, info, td)
      else:
        if self.mesh is not None:
          experience, _ = self.replay.sample_sharded(
              replay_state, k, self.sample_batch_size, self.mesh,
              num_steps=self.agent.train_sequence_length,
              axis_name=self.data_axis)
        else:
          experience, _ = self.replay.sample(
              replay_state, k, self.sample_batch_size,
              num_steps=self.agent.train_sequence_length)
        agent_state, loss_info = self.agent.train(agent_state, experience)
      return (agent_state, replay_state), loss_info

    k_samples = jax.random.split(k_sample, self.train_steps)
    (agent_state, replay_state), loss_infos = jax.lax.scan(
        train_once, (state.agent_state, replay_state), k_samples)
    loss_info = jax.tree_util.tree_map(lambda x: x[-1], loss_infos)

    new_state = LoopState(driver_state=driver_state,
                          replay_state=replay_state,
                          agent_state=agent_state,
                          metric_states=metric_states, key=key)
    return new_state, loss_info

  def run(self, state: LoopState, num_iterations: int):
    """num_iterations fused iterations as one device program."""

    def body(s, _):
      s, loss = self.iteration(s)
      return s, loss.loss

    state, losses = jax.lax.scan(body, state, None, length=num_iterations)
    return state, losses

  def run_with_info(self, state: LoopState, num_iterations: int):
    """Like `run` but returns the full stacked LossInfo (loss + extras),
    so the Learner can surface per-loss-component summaries the way the
    reference writes agent loss extras under its summary gate
    (train/learner.py:285-292)."""

    def body(s, _):
      return self.iteration(s)

    state, infos = jax.lax.scan(body, state, None, length=num_iterations)
    return state, infos

  def results(self, state: LoopState):
    return {
        m.name: m.result(ms)
        for m, ms in zip(self.metrics, state.metric_states)
    }

  def evaluate(self, state: LoopState, key, num_episodes: int = 10,
               max_steps: int = 10_000, eval_metrics=None):
    """Greedy-policy eval over exactly `num_episodes` episodes, jitted.

    The on-device analogue of the reference train_eval's periodic
    `metric_utils.eager_compute` over a DynamicEpisodeDriver
    (dqn/examples/v2/train_eval.py:306, dynamic_episode_driver.py:45):
    a fresh batch of env rows is reset and run until every row fills its
    episode quota; overshoot frames are masked so metrics count exactly
    N episodes. Returns {metric_name: device scalar}."""
    from agents_tpu.drivers.jax_driver import JaxEpisodeDriver
    from agents_tpu.metrics import jax_metrics

    metrics = tuple(eval_metrics) if eval_metrics else (
        jax_metrics.AverageReturnMetric(max(num_episodes, 10)),
        jax_metrics.AverageEpisodeLengthMetric(max(num_episodes, 10)),
        jax_metrics.NumberOfEpisodes())
    driver = JaxEpisodeDriver(self.env, self.agent.policy,
                              observers=[m.update for m in metrics])
    params = self.agent.policy_params(state.agent_state)
    k_init, k_run = jax.random.split(key)
    dstate = driver.init(k_init)
    obs_states = tuple(m.init(self.env.batch_size) for m in metrics)
    _, obs_states, _, completed = driver.run(params, dstate, obs_states,
                                             k_run, num_episodes, max_steps)
    # When called eagerly, surface a max_steps shortfall; under jit the
    # caller can compare the returned NumberOfEpisodes metric instead.
    if jax.core.is_concrete(completed) and int(completed) < num_episodes:
      import warnings
      warnings.warn(
          f"evaluate hit max_steps={max_steps} after only "
          f"{int(completed)}/{num_episodes} episodes; metrics cover "
          "fewer episodes than requested")
    return {m.name: m.result(s) for m, s in zip(metrics, obs_states)}
