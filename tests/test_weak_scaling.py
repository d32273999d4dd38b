"""Weak-scaling bound for the fused DP train loop on the 8-device
virtual CPU mesh.

BASELINE.md's >=0.8 two-host scaling-efficiency target is unmeasurable
in this sandbox (one real chip, no cross-host collectives), but the
program-overhead component of scaling IS measurable: with the per-device
workload held fixed (weak scaling), the 8-way-sharded fused iteration's
wall time should stay within a small factor of the 1-device time. On
virtual CPU "devices" (threads sharing host cores) this bounds SPMD
program overhead (partitioning, collectives, infeed), not ICI — the real
interconnect term is exercised by the driver's dryrun_multichip and the
DP-numerics tests.
"""
import os
import time

import jax
import numpy as np
import optax
import pytest

from agents_tpu import networks
from agents_tpu.agents.dqn import DqnAgent
from agents_tpu.environments.classic.cartpole import CartPole
from agents_tpu.environments.jax_environment import BatchedJaxEnv
from agents_tpu.parallel import create_mesh, shard_loop_state
from agents_tpu.replay_buffers import UniformReplay
from agents_tpu.train import FusedTrainLoop
from agents_tpu.trajectories import trajectory as tj
from agents_tpu.utils import common


def _loop(B, sample_batch, mesh=None):
  env = BatchedJaxEnv(CartPole(), batch_size=B)
  tss, asp = env.time_step_spec(), env.action_spec()
  qnet = networks.make_q_network(tss.observation, asp,
                                 fc_layer_params=(64,))
  agent = DqnAgent(tss, asp, qnet, optax.adam(1e-3), gamma=0.99,
                   td_errors_loss_fn=common.element_wise_squared_loss)
  replay = UniformReplay(tj.trajectory_spec(tss, asp), batch_size=B,
                         max_length=256)
  return FusedTrainLoop(env, agent, replay, sample_batch_size=sample_batch,
                        mesh=mesh)


def _timed_iterations(loop, state, iters=30):
  run = jax.jit(lambda s: loop.run(s, iters))
  state, losses = run(state)                       # compile + warmup
  jax.block_until_ready(losses)
  t0 = time.perf_counter()
  state, losses = run(state)
  jax.block_until_ready(losses)
  return time.perf_counter() - t0


def test_weak_scaling_program_overhead_bounded():
  assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
  PER_DEV_B, PER_DEV_S = 64, 32

  # 1 device, per-device workload.
  loop1 = _loop(PER_DEV_B, PER_DEV_S)
  s1 = loop1.init(jax.random.key(0), initial_collect_steps=4)
  t1 = _timed_iterations(loop1, s1)

  # 8 devices, 8x workload sharded over the mesh (same per-device load).
  mesh = create_mesh(8)
  loop8 = _loop(PER_DEV_B * 8, PER_DEV_S * 8, mesh=mesh)
  s8 = loop8.init(jax.random.key(0), initial_collect_steps=4)
  s8 = shard_loop_state(s8, mesh, PER_DEV_B * 8,
                        replay_capacity=loop8.replay.capacity)
  t8 = _timed_iterations(loop8, s8)

  n_cores = os.cpu_count() or 1
  # Virtual devices time-share host cores: with fewer cores than
  # devices, ideal weak scaling is bounded by core oversubscription.
  ideal = min(1.0, n_cores / 8)
  efficiency = t1 / t8
  # Wall-clock on a shared host is noisy (a concurrent training job can
  # eat both cores mid-measurement): retry the measurement pair up to
  # twice, keeping the best efficiency seen.
  for _ in range(2):
    if efficiency > 0.3 * ideal:
      break
    t1 = min(t1, _timed_iterations(loop1, s1))
    t8 = min(t8, _timed_iterations(loop8, s8))
    efficiency = t1 / t8
  print(f"weak scaling 1->8 virtual devices ({n_cores} cores): "
        f"t1={t1*1e3:.1f}ms t8={t8*1e3:.1f}ms "
        f"efficiency={efficiency:.2f} (core-bound ideal {ideal:.2f})")
  # Loose floor at 0.3x the core-bound ideal: catches gross SPMD
  # regressions — before sample_sharded, the all-gather of the whole
  # replay buffer each iteration put this at ~0.1x the ideal.
  assert efficiency > 0.3 * ideal, (t1, t8, n_cores)


def test_sharded_iteration_has_no_storage_allgather():
  """The mesh-aware fused loop must never move replay storage over the
  interconnect. The partitioner may still all-gather B-sized driver/
  metric leaves (trivial bytes); the regression this guards against is
  a capacity*B-sized all-gather — before sample_sharded, every storage
  leaf ([capacity, B] each) was all-gathered every iteration."""
  import re

  B, CAP = 64, 256
  mesh = create_mesh(8)
  loop = _loop(B, 32, mesh=mesh)
  state = loop.init(jax.random.key(0), initial_collect_steps=4)
  state = shard_loop_state(state, mesh, B, replay_capacity=CAP)
  hlo = jax.jit(loop.iteration).lower(state).compile().as_text()
  offenders = []
  for line in hlo.splitlines():
    m = re.search(r"= \w+\[([\d,]*)\][^ ]* all-gather\(", line)
    if m:
      dims = [int(d) for d in m.group(1).split(",") if d]
      elems = int(np.prod(dims)) if dims else 1
      if elems >= CAP * B // 8:       # one shard of one storage leaf
        offenders.append(line.strip()[:120])
  assert not offenders, offenders


def test_sharded_on_policy_iteration_collectives_bounded():
  """The DP on-policy (PPO) iteration must move only gradient-sized
  data: no all-gathers, all-reduces bounded by parameter count."""
  import re

  import optax
  from jax.sharding import NamedSharding, PartitionSpec as P

  from agents_tpu.agents.ppo import PPOClipAgent
  from agents_tpu.train import OnPolicyTrainLoop

  B, T = 64, 16
  env = BatchedJaxEnv(CartPole(), batch_size=B)
  tss, asp = env.time_step_spec(), env.action_spec()
  agent = PPOClipAgent(
      tss, asp, optax.adam(3e-4),
      networks.make_actor_distribution_network(tss.observation, asp,
                                               fc_layer_params=(64, 64)),
      networks.make_value_network(tss.observation, fc_layer_params=(64, 64)),
      num_epochs=2, num_minibatches=4, num_minibatch_shards=8)
  loop = OnPolicyTrainLoop(env, agent, rollout_length=T)
  state = loop.init(jax.random.key(0))
  mesh = create_mesh(8)

  def place(x):
    if hasattr(x, "shape") and len(x.shape) >= 1 and x.shape[0] == B:
      return jax.device_put(x, NamedSharding(mesh, P("data")))
    return jax.device_put(x, NamedSharding(mesh, P()))

  state = jax.tree_util.tree_map(place, state)
  hlo = jax.jit(loop.iteration).lower(state).compile().as_text()
  n_params = sum(int(np.prod(np.shape(p))) for p in
                 jax.tree_util.tree_leaves(state.agent_state))
  # Param-sized collectives are the gradient all-reduce (possibly
  # decomposed into reduce-scatter + all-gather by XLA). What must NOT
  # appear is anything rollout-sized: before num_minibatch_shards, the
  # global minibatch permutation all-gathered the flattened rollout
  # ([B*(T-1), obs]) every epoch.
  for line in hlo.splitlines():
    m = re.search(r"= \w+\[([\d,]*)\][^ ]* "
                  r"(all-gather|all-to-all|all-reduce)\(", line)
    if m:
      dims = [int(d) for d in m.group(1).split(",") if d]
      elems = int(np.prod(dims)) if dims else 1
      assert elems <= n_params, (m.group(2), elems, n_params,
                                 line.strip()[:120])
