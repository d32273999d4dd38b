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
  driver.run(environment.reset())
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
