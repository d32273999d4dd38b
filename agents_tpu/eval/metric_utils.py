"""Evaluation helpers.

Analogue of ``tf_agents/eval/metric_utils.py`` (compute :51 /
eager_compute :123): run a policy for N episodes and aggregate metrics.
Two paths: host envs (PyDriver) and pure-JAX envs (jitted scan eval).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from agents_tpu.drivers.py_driver import PyDriver
from agents_tpu.metrics import py_metrics


def compute(metrics: Sequence, environment, policy,
            num_episodes: int = 1) -> dict:
  """Host-env eval (reference :51)."""
  for m in metrics:
    m.reset()
  driver = PyDriver(environment, policy, observers=list(metrics),
                    max_episodes=num_episodes)
  # Stateful policies (e.g. recurrent ones behind JittedPyPolicy) need a
  # real initial carry, not the default () — same as Actor.
  policy_state = (policy.init_state(environment.batch_size)
                  if hasattr(policy, "init_state") else ())
  driver.run(environment.reset(), policy_state)
  return {m.name: m.result() for m in metrics}


def evaluate_jax_env(env, policy, params, key, num_steps: int,
                     metrics: Sequence = ()) -> dict:
  """Pure-JAX env eval: one jitted rollout, metric results on host.

  `num_steps` lockstep steps across env.batch_size rows; use a length
  comfortably above the episode horizon for unbiased AverageReturn.
  """
  from agents_tpu.drivers.jax_driver import JaxDriver
  from agents_tpu.metrics import jax_metrics

  metrics = tuple(metrics) or jax_metrics.standard_collect_metrics(
      buffer_size=32)
  driver = JaxDriver(env, policy, observers=[m.update for m in metrics])

  @jax.jit
  def _run(k):
    k_init, k_run = jax.random.split(k)
    dstate = driver.init(k_init)
    obs_states = tuple(m.init(env.batch_size) for m in metrics)
    _, obs_states = driver.run(params, dstate, obs_states, k_run, num_steps)
    return obs_states

  obs_states = _run(key)
  return {
      m.name: np.asarray(jax.device_get(m.result(s)))
      for m, s in zip(metrics, obs_states)
  }


def evaluate_jax_env_episodes(env, policy, params, key, num_episodes: int,
                              max_steps: int = 10_000,
                              metrics: Sequence = ()) -> dict:
  """Pure-JAX env eval over exactly `num_episodes` episodes.

  The device analogue of the reference's eager_compute +
  DynamicEpisodeDriver path (eval/metric_utils.py:123,
  dynamic_episode_driver.py:45): one jitted while_loop that stops when
  every row has filled its episode quota, masking overshoot frames so the
  metrics count exactly N episodes. Prefer this over `evaluate_jax_env`
  when the episode horizon varies (no need to guess a step budget)."""
  from agents_tpu.drivers.jax_driver import JaxEpisodeDriver
  from agents_tpu.metrics import jax_metrics

  metrics = tuple(metrics) or jax_metrics.standard_collect_metrics(
      buffer_size=max(num_episodes, 10))
  driver = JaxEpisodeDriver(env, policy, observers=[m.update for m in metrics])

  @jax.jit
  def _run(k):
    k_init, k_run = jax.random.split(k)
    dstate = driver.init(k_init)
    obs_states = tuple(m.init(env.batch_size) for m in metrics)
    _, obs_states, steps, completed = driver.run(
        params, dstate, obs_states, k_run, num_episodes, max_steps)
    return obs_states, steps, completed

  obs_states, steps, completed = _run(key)
  out = {
      m.name: np.asarray(jax.device_get(m.result(s)))
      for m, s in zip(metrics, obs_states)
  }
  out["_steps"] = int(steps)
  out["_episodes_completed"] = int(completed)
  if out["_episodes_completed"] < num_episodes:
    import warnings
    warnings.warn(
        f"evaluate_jax_env_episodes hit max_steps={max_steps} after only "
        f"{out['_episodes_completed']}/{num_episodes} episodes; reported "
        "averages cover fewer episodes than requested (raise max_steps "
        "or check the env terminates)")
  return out


class MetricsGroup:
  """Checkpointable bundle of host (py) metric state (reference
  eval/metric_utils.py:33 MetricsGroup + utils/numpy_storage.NumpyState).

  Device metrics checkpoint with the training-loop pytree for free; host
  metrics keep state in Python attributes, so this collects them into one
  plain-dict snapshot that orbax/json can persist and restore.
  """

  def __init__(self, metrics, name: str = "metrics_group"):
    self.metrics = list(metrics)
    self.name = name

  def results(self):
    return {m.name: m.result() for m in self.metrics}

  def reset(self):
    for m in self.metrics:
      m.reset()

  def state_dict(self):
    """JSON-serializable snapshot, delegating to each metric's
    get_state/set_state contract (py_metrics.PyMetric) — which
    deliberately excludes the per-row accumulator: on restore the host
    envs restart from reset, so a revived accumulator would credit the
    old half-episode to the new one."""
    return {f"{i}:{m.name}": (m.get_state() if hasattr(m, "get_state")
                              else {})
            for i, m in enumerate(self.metrics)}

  def load_state_dict(self, state):
    for i, m in enumerate(self.metrics):
      st = state.get(f"{i}:{m.name}")
      if st is not None and hasattr(m, "set_state"):
        m.set_state(st)
