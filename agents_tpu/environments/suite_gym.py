"""Environment suite for gymnasium (incl. MuJoCo envs).

Analogue of ``tf_agents/environments/suite_gym.py:45`` (load) and
``:101`` (wrap_env). `suite_mujoco`-style usage is just
``suite_gym.load('HalfCheetah-v5')`` — gymnasium ships the MuJoCo tasks.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

from agents_tpu.environments import wrappers as wrappers_lib
from agents_tpu.environments.gym_wrapper import GymWrapper


def load(environment_name: str,
         discount: float = 1.0,
         max_episode_steps: Optional[int] = None,
         gym_env_wrappers: Sequence[Callable] = (),
         env_wrappers: Sequence[Callable] = (),
         gym_kwargs: Optional[dict] = None):
  """Create a gymnasium env wrapped as a PyEnvironment (reference :45).

  `max_episode_steps=None` uses the registry default; 0 disables the
  limit (matching reference semantics).
  """
  import gymnasium as gym

  gym_kwargs = gym_kwargs or {}
  spec = gym.spec(environment_name)
  if max_episode_steps is None and spec.max_episode_steps is not None:
    max_episode_steps = spec.max_episode_steps
  gym_env = spec.make(disable_env_checker=True, **gym_kwargs)
  # gymnasium's own TimeLimit is applied by make(); strip it so OUR
  # TimeLimit wrapper controls truncation like the reference.
  while hasattr(gym_env, "env") and type(gym_env).__name__ in (
      "TimeLimit", "OrderEnforcing", "PassiveEnvChecker"):
    gym_env = gym_env.env
  return wrap_env(gym_env, discount=discount,
                  max_episode_steps=max_episode_steps,
                  gym_env_wrappers=gym_env_wrappers,
                  env_wrappers=env_wrappers)


def wrap_env(gym_env,
             discount: float = 1.0,
             max_episode_steps: Optional[int] = None,
             gym_env_wrappers: Sequence[Callable] = (),
             env_wrappers: Sequence[Callable] = (),
             auto_reset: bool = True):
  """reference :101."""
  for w in gym_env_wrappers:
    gym_env = w(gym_env)
  env = GymWrapper(gym_env, discount=discount, auto_reset=auto_reset)
  if max_episode_steps:
    env = wrappers_lib.TimeLimit(env, max_episode_steps)
  for w in env_wrappers:
    env = w(env)
  return env
