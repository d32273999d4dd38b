"""Catch (bsuite) as a pure-JAX environment.

The classic bsuite pixel-control task the reference reaches through
``suite_bsuite`` (tf_agents/environments/suite_bsuite.py): a ball falls
one row per step down a `rows x columns` board; the agent moves a paddle
on the bottom row left/stay/right and gets +1 for catching the ball, -1
for missing. Observation is the [rows, columns, 1] pixel board, so this
is the smallest end-to-end exercise of the conv Q-network path — an
on-device substitute for the ALE-backed Atari examples when ale-py is
absent from the image.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from agents_tpu.environments.jax_environment import JaxEnvironment
from agents_tpu.specs import array_spec
from agents_tpu.trajectories import time_step as ts


@struct.dataclass
class CatchState:
  ball_row: jax.Array   # int32
  ball_col: jax.Array   # int32
  paddle_col: jax.Array  # int32


class Catch(JaxEnvironment):
  """rows x columns Catch; episode length = rows - 1 steps."""

  def __init__(self, rows: int = 10, columns: int = 5):
    self.rows = rows
    self.columns = columns

  def observation_spec(self):
    return array_spec.BoundedArraySpec(
        (self.rows, self.columns, 1), np.float32, 0.0, 1.0, "board")

  def action_spec(self):
    # 0 = left, 1 = stay, 2 = right
    return array_spec.BoundedArraySpec((), np.int32, 0, 2, "action")

  def _board(self, state: CatchState):
    board = jnp.zeros((self.rows, self.columns), jnp.float32)
    board = board.at[state.ball_row, state.ball_col].set(1.0)
    board = board.at[self.rows - 1, state.paddle_col].set(1.0)
    return board[..., None]

  def reset(self, key):
    ball_col = jax.random.randint(key, (), 0, self.columns)
    state = CatchState(
        ball_row=jnp.zeros((), jnp.int32),
        ball_col=ball_col.astype(jnp.int32),
        paddle_col=jnp.asarray(self.columns // 2, jnp.int32))
    return state, ts.restart(self._board(state))

  def step(self, state: CatchState, action, key):
    del key
    move = action.astype(jnp.int32) - 1
    paddle = jnp.clip(state.paddle_col + move, 0, self.columns - 1)
    ball_row = state.ball_row + 1
    new_state = CatchState(ball_row=ball_row, ball_col=state.ball_col,
                           paddle_col=paddle)
    done = ball_row >= self.rows - 1
    caught = paddle == state.ball_col
    reward = jnp.where(done,
                       jnp.where(caught, 1.0, -1.0).astype(jnp.float32),
                       jnp.zeros((), jnp.float32))
    board = self._board(new_state)
    return new_state, ts.TimeStep(
        step_type=jnp.where(done, ts.StepType.LAST,
                            ts.StepType.MID).astype(jnp.int32),
        reward=reward,
        discount=jnp.where(done, 0.0, 1.0).astype(jnp.float32),
        observation=board)
