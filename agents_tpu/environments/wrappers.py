"""Host environment wrappers.

Analogue of ``tf_agents/environments/wrappers.py`` (16 wrappers; the full
production set is implemented here — reference line numbers cited per
class).
"""
from __future__ import annotations

import collections
import time
from typing import Any, Callable, Optional, Sequence

import numpy as np

from agents_tpu.environments.py_environment import PyEnvironment
from agents_tpu.specs import array_spec
from agents_tpu.trajectories import time_step as ts


class PyEnvironmentBaseWrapper(PyEnvironment):
  """Forwards everything (reference :52)."""

  def __init__(self, env: PyEnvironment,
               handle_auto_reset: Optional[bool] = None):
    # Inherit the wrapped env's auto-reset opt-out by default (the
    # reference plumbs handle_auto_reset through wrapper constructors):
    # without this, TimeLimit(GymWrapper(env, auto_reset=False)) would
    # silently re-enable auto-reset at the wrapper level.
    if handle_auto_reset is None:
      handle_auto_reset = getattr(env, "_handle_auto_reset", True)
    super().__init__(handle_auto_reset=handle_auto_reset)
    self._env = env

  @property
  def wrapped_env(self):
    return self._env

  @property
  def batched(self):
    return self._env.batched

  @property
  def batch_size(self):
    return self._env.batch_size

  def observation_spec(self):
    return self._env.observation_spec()

  def action_spec(self):
    return self._env.action_spec()

  def reward_spec(self):
    return self._env.reward_spec()

  def _reset(self):
    return self._env.reset()

  def _step(self, action):
    return self._env.step(action)

  def render(self, mode="rgb_array"):
    return self._env.render(mode)

  def seed(self, seed):
    return self._env.seed(seed)

  def close(self):
    return self._env.close()

  def get_info(self):
    return self._env.get_info()


class TimeLimit(PyEnvironmentBaseWrapper):
  """Truncate episodes after `duration` steps (reference :99)."""

  def __init__(self, env, duration: int):
    super().__init__(env)
    self._duration = duration
    self._num_steps = None
    self._pending_reset = None

  def _reset(self):
    time_step = self._env.reset()
    self._num_steps = np.zeros(np.shape(time_step.step_type), np.int64)
    self._pending_reset = np.zeros(np.shape(time_step.step_type), bool)
    return time_step

  def _step(self, action):
    if self._num_steps is None:
      return self._reset()
    time_step = self._env.step(action)
    st = np.asarray(time_step.step_type)
    # Rows stamped LAST by truncation on the previous frame: the inner
    # env saw MID there and kept its episode going, so from the agent's
    # view THIS frame starts a new logical episode — relabel it FIRST
    # with restart reward/discount (auto-reset semantics for one row,
    # which a generic batched inner env cannot perform itself). Without
    # this the stale >=duration counter re-stamps the row LAST on every
    # subsequent frame (LAST,LAST,... protocol violation). Rows whose
    # inner env DID emit FIRST (a per-row auto-resetting inner) need no
    # relabel — the inner reset already closed the loop.
    #
    # Known edge (round-5 review): if the inner episode GENUINELY
    # terminates on this exact frame (LAST one step after the
    # truncation), the relabel treats it like any continuing frame. In
    # truncation semantics the agent's episode already ended last frame
    # — a reference single env would have reset and never seen this
    # terminal — so dropping its reward matches reset behavior; the
    # cost is one phantom FIRST at a near-terminal state (and, with a
    # per-row auto-resetting inner, a FIRST->FIRST pair) for the rare
    # coincidence. Exact per-row semantics need an inner env with
    # per-row reset control, which a generic batched env lacks.
    if np.any(self._pending_reset):
      relabel = self._pending_reset & (st != ts.StepType.FIRST)
      if np.any(relabel):
        reward = np.asarray(time_step.reward)
        discount = np.asarray(time_step.discount)
        st = np.where(relabel, ts.StepType.FIRST, st).astype(st.dtype)
        time_step = time_step.replace(
            step_type=st,
            reward=np.where(relabel, np.zeros_like(reward), reward),
            discount=np.where(relabel, np.ones_like(discount), discount))
      self._pending_reset = np.zeros_like(self._pending_reset)
    # Per-row accounting: rows of a batched env hit the limit
    # independently. A freshly auto-reset FIRST row restarts its count;
    # stamping ALL rows LAST whenever the global count expired would
    # corrupt such rows (FIRST frame rewritten as LAST, length-1
    # episodes).
    self._num_steps = np.where(st == ts.StepType.FIRST, 0,
                               self._num_steps + 1)
    over = (self._num_steps >= self._duration) & (st == ts.StepType.MID)
    if np.any(over):
      time_step = time_step.replace(
          step_type=np.where(over, ts.StepType.LAST, st).astype(st.dtype))
      self._pending_reset = self._pending_reset | over
    return time_step

  @property
  def duration(self):
    return self._duration


class FixedLength(PyEnvironmentBaseWrapper):
  """Forces episodes to exactly `episode_length` frames (reference :137);
  early LASTs are converted to MIDs with env auto-reset underneath."""

  def __init__(self, env, episode_length: int):
    super().__init__(env)
    self._length = episode_length
    self._count = 0

  def _reset(self):
    self._count = 0
    return self._env.reset()

  def _step(self, action):
    inner = self._env.step(action)
    self._count += 1
    if self._count >= self._length:
      self._count = 0
      if not np.all(inner.step_type == ts.StepType.LAST):
        return inner.replace(
            step_type=np.full_like(inner.step_type, ts.StepType.LAST))
      return inner
    if np.all(inner.step_type == ts.StepType.LAST):
      restarted = self._env.reset()
      return restarted.replace(
          step_type=np.full_like(inner.step_type, ts.StepType.MID),
          reward=inner.reward, discount=inner.discount)
    return inner


class ActionRepeat(PyEnvironmentBaseWrapper):
  """Repeat actions `times`, summing rewards (reference :250)."""

  def __init__(self, env, times: int):
    super().__init__(env)
    if times <= 1:
      raise ValueError("times must be > 1")
    self._times = times

  def _step(self, action):
    total_reward = 0.0
    time_step = None
    for _ in range(self._times):
      time_step = self._env.step(action)
      total_reward += np.asarray(time_step.reward)
      if np.any(time_step.step_type == ts.StepType.LAST) or np.any(
          time_step.step_type == ts.StepType.FIRST):
        break
    return time_step.replace(
        reward=np.asarray(total_reward, np.float32))


class RunStats(PyEnvironmentBaseWrapper):
  """Counts steps/episodes/resets (reference :453)."""

  def __init__(self, env):
    super().__init__(env)
    self.total_steps = 0
    self.episodes = 0
    self.resets = 0

  def _reset(self):
    self.resets += 1
    return self._env.reset()

  def _step(self, action):
    time_step = self._env.step(action)
    if np.all(time_step.step_type == ts.StepType.FIRST):
      self.resets += 1
    else:
      self.total_steps += 1
    if np.all(time_step.step_type == ts.StepType.LAST):
      self.episodes += 1
    return time_step


class PerformanceProfiler(PyEnvironmentBaseWrapper):
  """Aggregates env-step wall time and calls back every
  `process_profile_every_n_steps` (reference :191)."""

  def __init__(self, env, process_profile_fn: Callable[[float, int], None],
               process_steps: int = 100):
    super().__init__(env)
    self._fn = process_profile_fn
    self._every = process_steps
    self._acc = 0.0
    self._n = 0

  def _step(self, action):
    t0 = time.perf_counter()
    out = self._env.step(action)
    self._acc += time.perf_counter() - t0
    self._n += 1
    if self._n >= self._every:
      self._fn(self._acc, self._n)
      self._acc, self._n = 0.0, 0
    return out


class ActionDiscretizeWrapper(PyEnvironmentBaseWrapper):
  """Continuous -> discrete action grid (reference :509)."""

  def __init__(self, env, num_actions):
    super().__init__(env)
    spec = env.action_spec()
    if not array_spec.is_continuous(spec):
      raise ValueError("ActionDiscretizeWrapper requires a continuous spec")
    self._num_actions = np.broadcast_to(np.asarray(num_actions), spec.shape)
    lows = np.broadcast_to(spec.minimum, spec.shape)
    highs = np.broadcast_to(spec.maximum, spec.shape)
    self._action_map = [
        np.linspace(l, h, int(n))
        for l, h, n in zip(np.ravel(lows), np.ravel(highs),
                           np.ravel(self._num_actions))
    ]
    if spec.shape == ():
      self._action_spec = array_spec.BoundedArraySpec(
          (), np.int32, 0, int(self._num_actions) - 1, name="action")
    else:
      self._action_spec = array_spec.BoundedArraySpec(
          spec.shape, np.int32, 0,
          (self._num_actions - 1).astype(np.int32), name="action")
    self._orig_shape = spec.shape
    self._orig_dtype = spec.dtype

  def action_spec(self):
    return self._action_spec

  def _step(self, action):
    flat = np.ravel(np.asarray(action))
    cont = np.array([m[int(a)] for m, a in zip(self._action_map, flat)],
                    dtype=self._orig_dtype).reshape(self._orig_shape)
    return self._env.step(cont)


class ActionClipWrapper(PyEnvironmentBaseWrapper):
  """Clip actions to spec bounds (reference :648)."""

  def _step(self, action):
    spec = self._env.action_spec()

    def _clip(a, s):
      if isinstance(s, array_spec.BoundedArraySpec):
        return np.clip(np.asarray(a), s.minimum, s.maximum)
      return a

    import jax
    clipped = jax.tree_util.tree_map(
        _clip, action, spec,
        is_leaf=lambda x: isinstance(x, array_spec.ArraySpec)) \
        if not isinstance(spec, array_spec.ArraySpec) else _clip(action, spec)
    return self._env.step(clipped)


class ActionOffsetWrapper(PyEnvironmentBaseWrapper):
  """Shift discrete action specs to be 0-based (reference :677)."""

  def __init__(self, env):
    super().__init__(env)
    spec = env.action_spec()
    if not array_spec.is_discrete(spec):
      raise ValueError("ActionOffsetWrapper requires a discrete spec")
    self._offset = spec.minimum
    self._action_spec = array_spec.BoundedArraySpec(
        spec.shape, spec.dtype, 0, spec.maximum - spec.minimum,
        name=spec.name)

  def action_spec(self):
    return self._action_spec

  def _step(self, action):
    return self._env.step(np.asarray(action) + self._offset)


class FlattenObservationsWrapper(PyEnvironmentBaseWrapper):
  """Concatenate (selected) observation leaves into one vector
  (reference :715)."""

  def __init__(self, env, observations_allowlist: Optional[Sequence] = None):
    super().__init__(env)
    import jax
    obs_spec = env.observation_spec()
    if observations_allowlist is not None:
      if not isinstance(obs_spec, dict):
        raise ValueError("allowlist requires dict observations")
      obs_spec = {k: obs_spec[k] for k in observations_allowlist}
    self._allowlist = observations_allowlist
    leaves = jax.tree_util.tree_leaves(
        obs_spec, is_leaf=lambda s: isinstance(s, array_spec.ArraySpec))
    dtypes = {l.dtype for l in leaves}
    if len(dtypes) > 1:
      raise ValueError(f"Observations must share dtype, got {dtypes}")
    size = int(sum(np.prod(l.shape) for l in leaves))
    self._observation_spec = array_spec.ArraySpec(
        (size,), leaves[0].dtype, name="observation")

  def observation_spec(self):
    return self._observation_spec

  def _flatten(self, time_step):
    import jax
    obs = time_step.observation
    if self._allowlist is not None:
      obs = {k: obs[k] for k in self._allowlist}
    leaves = jax.tree_util.tree_leaves(obs)
    flat = np.concatenate([np.ravel(l) for l in leaves])
    return time_step.replace(
        observation=flat.astype(self._observation_spec.dtype))

  def _reset(self):
    return self._flatten(self._env.reset())

  def _step(self, action):
    return self._flatten(self._env.step(action))


class HistoryWrapper(PyEnvironmentBaseWrapper):
  """Frame stacking: observation becomes the last `history_length` frames
  stacked on the last axis (reference :1021), optionally with actions."""

  def __init__(self, env, history_length: int = 3,
               include_actions: bool = False, tile_first_step_obs=False):
    super().__init__(env)
    self._history_length = history_length
    self._include_actions = include_actions
    obs_spec = env.observation_spec()
    self._tile_first_step_obs = tile_first_step_obs
    self._obs_spec_single = obs_spec
    stack = lambda s: s.replace(
        shape=s.shape[:-1] + (s.shape[-1] * history_length,)) \
        if s.shape else s.replace(shape=(history_length,))
    self._observation_spec = array_spec.map_spec_nest(stack, obs_spec)
    if include_actions:
      act_spec = env.action_spec()
      self._observation_spec = {
          "observation": self._observation_spec,
          "action": array_spec.map_spec_nest(stack, act_spec),
      }
    self._obs_history = collections.deque(maxlen=history_length)
    self._action_history = collections.deque(maxlen=history_length)

  def observation_spec(self):
    return self._observation_spec

  def _stack(self):
    import jax
    obs = jax.tree_util.tree_map(
        lambda *xs: np.concatenate(
            [np.atleast_1d(x) for x in xs], axis=-1), *self._obs_history)
    if not self._include_actions:
      return obs
    act = jax.tree_util.tree_map(
        lambda *xs: np.concatenate(
            [np.atleast_1d(x) for x in xs], axis=-1),
        *self._action_history)
    return {"observation": obs, "action": act}

  def _zero_action(self):
    return array_spec.map_spec_nest(
        lambda s: np.zeros(s.shape, s.dtype), self._env.action_spec())

  def _zero_obs(self):
    return array_spec.map_spec_nest(
        lambda s: np.zeros(s.shape, s.dtype), self._obs_spec_single)

  def _reset(self):
    time_step = self._env.reset()
    # tile_first_step_obs=False (reference default): pre-episode history
    # is ZERO frames so the agent can distinguish an episode start from
    # history_length repeats of the same real frame; True tiles the
    # first observation (environments/wrappers.py:1021).
    pad = (time_step.observation if self._tile_first_step_obs
           else self._zero_obs())
    for _ in range(self._history_length - 1):
      self._obs_history.append(pad)
      self._action_history.append(self._zero_action())
    self._obs_history.append(time_step.observation)
    self._action_history.append(self._zero_action())
    return time_step.replace(observation=self._stack())

  def _step(self, action):
    time_step = self._env.step(action)
    if np.all(time_step.step_type == ts.StepType.FIRST):
      # auto-reset happened underneath
      self._obs_history.clear()
      self._action_history.clear()
      pad = (time_step.observation if self._tile_first_step_obs
             else self._zero_obs())
      for _ in range(self._history_length - 1):
        self._obs_history.append(pad)
        self._action_history.append(self._zero_action())
      self._obs_history.append(time_step.observation)
      self._action_history.append(self._zero_action())
      return time_step.replace(observation=self._stack())
    self._obs_history.append(time_step.observation)
    self._action_history.append(np.asarray(action))
    return time_step.replace(observation=self._stack())


class OneHotActionWrapper(PyEnvironmentBaseWrapper):
  """Accepts one-hot actions, forwards the argmax (reference :1125)."""

  def __init__(self, env):
    super().__init__(env)
    spec = env.action_spec()
    if not array_spec.is_discrete(spec) or spec.shape not in ((), (1,)):
      raise ValueError("OneHotActionWrapper requires scalar discrete spec")
    self._inner_spec = spec
    self._action_spec = array_spec.BoundedArraySpec(
        (spec.num_values,), np.int32, 0, 1, name="one_hot_action")

  def action_spec(self):
    return self._action_spec

  def _step(self, action):
    idx = np.argmax(np.asarray(action), axis=-1).astype(
        self._inner_spec.dtype)
    idx = idx + self._inner_spec.minimum
    # The constructor accepts shape-(1,) inner specs; forward an action
    # of that shape, not the argmax scalar.
    if self._inner_spec.shape == (1,):
      idx = np.reshape(idx, np.shape(idx) + (1,))
    return self._env.step(idx)


class ObservationFilterWrapper(PyEnvironmentBaseWrapper):
  """Keep only the given indices of a flat observation (reference :390)."""

  def __init__(self, env, idx):
    super().__init__(env)
    spec = env.observation_spec()
    if not isinstance(spec, array_spec.ArraySpec) or len(spec.shape) != 1:
      raise ValueError("requires a single 1-D observation spec")
    self._idx = np.asarray(idx)
    self._observation_spec = spec.replace(shape=(len(self._idx),))

  def observation_spec(self):
    return self._observation_spec

  def _filter(self, time_step):
    return time_step.replace(
        observation=np.asarray(time_step.observation)[self._idx])

  def _reset(self):
    return self._filter(self._env.reset())

  def _step(self, action):
    return self._filter(self._env.step(action))


class FlattenActionWrapper(PyEnvironmentBaseWrapper):
  """Flattens a nest of action specs into one 1-D continuous action
  (reference :298)."""

  def __init__(self, env):
    super().__init__(env)
    import jax
    self._leaves = jax.tree_util.tree_leaves(
        env.action_spec(),
        is_leaf=lambda s: isinstance(s, array_spec.ArraySpec))
    self._treedef = jax.tree_util.tree_structure(
        env.action_spec(),
        is_leaf=lambda s: isinstance(s, array_spec.ArraySpec))
    if not all(array_spec.is_continuous(s) for s in self._leaves):
      raise ValueError("FlattenActionWrapper requires continuous specs")
    sizes = [int(np.prod(s.shape)) if s.shape else 1 for s in self._leaves]
    self._sizes = sizes
    lows = np.concatenate([
        np.broadcast_to(s.minimum, s.shape or (1,)).ravel()
        for s in self._leaves])
    highs = np.concatenate([
        np.broadcast_to(s.maximum, s.shape or (1,)).ravel()
        for s in self._leaves])
    self._action_spec = array_spec.BoundedArraySpec(
        (sum(sizes),), self._leaves[0].dtype, lows, highs, "action")

  def action_spec(self):
    return self._action_spec

  def _step(self, action):
    import jax
    flat = np.asarray(action)
    parts, off = [], 0
    for s, size in zip(self._leaves, self._sizes):
      parts.append(flat[off:off + size].reshape(s.shape).astype(s.dtype))
      off += size
    return self._env.step(jax.tree_util.tree_unflatten(self._treedef, parts))


class ExtraDisabledActionsWrapper(PyEnvironmentBaseWrapper):
  """Adds `num_extra_actions` unusable actions plus a validity mask in the
  observation (reference :1181): observation becomes
  {'observation': obs, 'valid_actions': mask}."""

  def __init__(self, env, num_extra_actions: int):
    super().__init__(env)
    spec = env.action_spec()
    if not array_spec.is_discrete(spec) or spec.shape != ():
      raise ValueError("Requires scalar discrete action spec")
    self._orig_num = spec.num_values
    self._total = self._orig_num + num_extra_actions
    self._action_spec = array_spec.BoundedArraySpec(
        (), spec.dtype, 0, self._total - 1, "action")
    self._observation_spec = {
        "observation": env.observation_spec(),
        "valid_actions": array_spec.BoundedArraySpec(
            (self._total,), np.bool_, False, True, "valid_actions"),
    }

  def observation_spec(self):
    return self._observation_spec

  def action_spec(self):
    return self._action_spec

  def _mask(self, time_step):
    mask = np.zeros((self._total,), np.bool_)
    mask[:self._orig_num] = True
    return time_step.replace(observation={
        "observation": time_step.observation, "valid_actions": mask})

  def _reset(self):
    return self._mask(self._env.reset())

  def _step(self, action):
    a = int(np.asarray(action))
    if a >= self._orig_num:
      raise ValueError(f"Disabled action {a} taken (valid < {self._orig_num})")
    return self._mask(self._env.step(action))


class GoalReplayEnvWrapper(PyEnvironmentBaseWrapper):
  """Hindsight-style goal substitution hook (reference :942): exposes
  `get_trajectory_with_goal(trajectory, goal)` to relabel stored
  trajectories with achieved goals. Subclass and implement the two
  abstract hooks for a concrete goal-conditioned env."""

  def get_goal_from_trajectory(self, trajectory):
    raise NotImplementedError

  def get_trajectory_with_goal(self, trajectory, goal):
    raise NotImplementedError
