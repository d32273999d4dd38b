"""Headline benchmark: fused DQN-CartPole train loop on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: env-steps/s sustained by the fused collect+train iteration
(1 gradient step per env-batch step, the reference BASELINE config's
cadence — agents/dqn/examples/v2/train_eval.py:94-127). The run must also
reach CartPole average return >= 195 (solved) or value is reported as 0 —
throughput without learning doesn't count.

vs_baseline: ratio to TF-Agents' classic in-graph CPU train_eval
throughput on this config, MEASURED on this host at 362 env-steps/s
(best of two runs, 337-362; benchmark/ref_dqn_baseline.py runs the
reference code itself — TFPyEnvironment + DynamicStepDriver +
agent.train — at the train_eval.py:94-127 operating point with
checkpoints/summaries off, i.e. an upper bound on the reference).
Driver target: >= 10x per chip.

Design notes: the axon TPU tunnel has multi-minute latency spikes on
compiles and eager host transfers, so this bench uses exactly two device
programs (init, run-2000-iterations) executed with warmup, and reads
metrics from device once at the end.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

# Measured via benchmark/ref_dqn_baseline.py (see module docstring).
TF_AGENTS_CPU_ENV_STEPS_PER_S = 362.0

# Reference SAC collect+train cadence on this host CPU, measured via
# benchmark/ref_sac_baseline.py (the reference's own SacAgent +
# TanhNormalProjection at the haarnoja18 operating point, Walker2d-v5).
# Two operating points measured: 61.0 env-steps/s single-threaded over
# a 250k-step run (docs/ref_sac_v5_measurement.md) and 90.4 env-steps/s
# BEST-CASE (both cores, idle host, no evals, 6k-step probe at round-5
# end). vs_baseline divides by the best case — the conservative ratio.
# Context for reading it: on this 2-core rig BOTH sides are bound by
# host MuJoCo stepping, not the chip (our probe runs 32 parallel envs
# on the same 2 cores; the chip sustains UTD 1.0 with headroom), so the
# ratio scales with host cores — the reference's single-env collect
# loop cannot use more of them, ours can.
TF_AGENTS_SAC_CPU_ENV_STEPS_PER_S = 90.4

# TPU v5e (lite) peak: 197 TFLOP/s bf16 per chip.
V5E_PEAK_FLOPS_BF16 = 197e12


def sac_live_probe(seconds: float = 90.0):
  """Live SAC-HalfCheetah throughput at the reference operating point
  (UTD 1.0, haarnoja18 nets, host MuJoCo collection): runs the real
  async host-device loop and reports sustained env-steps/s AND
  train-steps/s. The probe PRE-RAMPS: it repeats short runs until the
  trainer thread demonstrably keeps up (utd_realized >= 0.8), absorbing
  compile + tunnel program-load stalls (round-3 capture measured only
  collection because the first train-chunk execution stalled through
  the whole window). `probe_ok` asserts the timed window actually
  covered the train path. Returns an error dict when MuJoCo is
  unavailable."""
  import optax

  from agents_tpu import networks
  from agents_tpu.agents.sac import SacAgent
  from agents_tpu.environments import suite_gym
  from agents_tpu.environments.batched_py_environment import (
      BatchedPyEnvironment,)
  from agents_tpu.metrics import py_metrics
  from agents_tpu.replay_buffers import UniformReplay
  from agents_tpu.train import AsyncHostDeviceTrainLoop
  from agents_tpu.trajectories import trajectory as tj

  B = 32
  env = BatchedPyEnvironment(
      [suite_gym.load("HalfCheetah-v5") for _ in range(B)])
  tss, asp = env.time_step_spec(), env.action_spec()
  agent = SacAgent(
      tss, asp,
      critic_network=networks.make_critic_network(
          tss.observation, asp, joint_fc_layer_params=(256, 256)),
      actor_network=networks.make_sac_actor_network(
          tss.observation, asp, fc_layer_params=(256, 256)),
      actor_optimizer=optax.adam(3e-4), critic_optimizer=optax.adam(3e-4),
      alpha_optimizer=optax.adam(3e-4), reward_scale_factor=0.1)
  replay = UniformReplay(tj.trajectory_spec(tss, asp), batch_size=B,
                         max_length=4096)
  loop = AsyncHostDeviceTrainLoop(
      env, agent, replay, sample_batch_size=256,
      train_steps_per_call=32, utd_ratio=1.0,
      min_replay_frames=64 * B,
      py_metrics=[py_metrics.EnvironmentSteps()])

  min_frames = 64 * B

  def utd_of(out, ticks):
    # train steps only start once the replay holds min_frames; normalize
    # by the trainable portion of the window.
    trainable = max(ticks * B - min_frames, 1)
    return int(out["train_steps"]) / trainable

  # Pre-ramp: repeat short runs until the trainer keeps up. The first
  # execution of the train-chunk program can stall minutes on the axon
  # tunnel's program-load queue — that stall must be absorbed HERE, not
  # inside the timed window.
  ramp_utd, ramp_runs = 0.0, 0
  for ramp_runs in range(1, 7):
    out = loop.run(total_env_batch_steps=256, seed=0,
                   initial_random_steps=32)
    ramp_utd = utd_of(out, 256)
    if ramp_utd >= 0.8:
      break

  ticks = max(1200, int(seconds * 650 / B))  # ~`seconds` at measured rate
  t0 = time.time()
  out = loop.run(total_env_batch_steps=ticks, seed=0,
                 initial_random_steps=32)
  dt = time.time() - t0
  train_steps = int(out["train_steps"])
  utd = utd_of(out, ticks)
  return {
      "env_steps_per_s": round(ticks * B / dt, 1),
      "train_steps_per_s": round(train_steps / dt, 1),
      # Realized update-to-data over the trainable window: the haarnoja18
      # cadence is 1.0; the guard demands >= 0.8 or the probe FAILS.
      "utd_realized": round(utd, 3),
      "probe_ok": bool(utd >= 0.8),
      "ramp_runs": ramp_runs,
      "ramp_utd": round(ramp_utd, 3),
      "window_s": round(dt, 1),
      "ref_cpu_env_steps_per_s": TF_AGENTS_SAC_CPU_ENV_STEPS_PER_S,
      "vs_baseline": round(
          ticks * B / dt / TF_AGENTS_SAC_CPU_ENV_STEPS_PER_S, 1),
      "note": "live haarnoja18 operating point, 32 MuJoCo envs on host; "
              "pre-ramped until the trainer thread sustains UTD, so the "
              "timed window covers the train path (probe_ok=false means "
              "a train-path wall-clock regression, not thread ramp)",
  }


def conv_bench(max_length: int = 2048):
  """Atari-scale conv-path benchmark: mnih15 DQN over 84x84x4 uint8
  observations (synthetic on-device pixels standing in for ALE, which is
  absent from the image — reference proof point examples/dqn/mnih15 +
  benchmark/dqn_benchmark.py:57-73). Reports env-steps/s, train-step
  wall time, and MFU (analytic model FLOPs / v5e bf16 peak) for the
  fused collect+train iteration.

  `max_length` is the per-row ring capacity: total stored frames =
  128 rows x max_length (2048 -> 262k frames = 7.4 GB of HBM, the max
  that fits v5e's 16 GB next to the nets; the reference's 1M-frame
  buffer is the HOST-RAM path measured by host_atari_replay_probe).

  Batch sweep on the chip (B rows x train sample): 128x256 = 17.0% MFU
  @ 1.10 ms/iter, 128x512 = 19.5%, 256x1024 = 19.1%, 128x2048 = 19.9%
  (301k train-frames/s).

  Where the non-model ~0.9 ms/iter goes (round-5 in-scan ablation,
  benchmark/profile_conv_trace.py -> profiles/conv_trace_profile.json —
  every variant keeps the 100-iteration lax.scan structure so
  per-program dispatch cancels in full-minus-ablated differences;
  round 4's standalone-component timings measured their own dispatch
  and wrongly blamed a "dispatch floor"): the fused iteration splits
  into train-path-minus-gather ~0.5 ms (optimizer + target net +
  huber + casts around the 0.19 ms of pure model FLOPs), replay
  gather ~0.34 ms (full minus no-gather, interleaved same-process
  controls), env step ~0.1-0.26 ms, metrics ~0.01-0.07 ms — i.e. the
  plateau is the train path plus the gather, in-program, NOT dispatch.

  The capacity term (17.15% MFU @65k -> ~14.4% @262k, +0.19 ms/iter)
  is NOT the gather: with interleaved same-process A/B programs the
  gather attribution is ~0.34 ms at BOTH capacities and bench-level
  fill. A sorted-index (HBM address order) gather was implemented and
  measured for it — 1.478 vs 1.467 ms/iter median, NO win, REJECTED
  (kept behind UniformReplay(sort_for_locality=True), default off);
  an earlier cross-process comparison that suggested -15% was
  axon-tunnel run-to-run drift (its no-gather control moved just as
  much — profiles/gather_fill_effect.json records both measurements
  and the correction). The residual candidate for the +0.19 ms is the
  ring insert/update path on the 7 GB buffer; unattributed as of
  round 5 and stated so. The space-to-depth attempt (1.015x) stays
  REJECTED below the 5% bar. The headline uses sample 256, the
  cadence-realistic setting."""
  import optax

  from agents_tpu import metrics, networks
  from agents_tpu.agents.dqn import DqnAgent
  from agents_tpu.environments.classic.synthetic_pixels import (
      SyntheticPixels,)
  from agents_tpu.environments.jax_environment import BatchedJaxEnv
  from agents_tpu.replay_buffers import UniformReplay
  from agents_tpu.train import FusedTrainLoop
  from agents_tpu.trajectories import trajectory as tj
  from agents_tpu.utils import common

  smoke = bool(os.environ.get("AGENTS_TPU_BENCH_SMOKE"))
  B, SAMPLE, CAPACITY = (8, 16, 64) if smoke else (128, 256, max_length)
  env = BatchedJaxEnv(SyntheticPixels(size=20 if smoke else 84),
                      batch_size=B)
  tss, asp = env.time_step_spec(), env.action_spec()
  qnet = networks.make_q_network(
      tss.observation, asp,
      conv_layer_params=((32, 8, 4), (64, 4, 2), (64, 3, 1)),
      fc_layer_params=(512,), dtype=jnp.bfloat16,
      preprocessing=lambda x: x.astype(jnp.bfloat16) / 255.0)
  agent = DqnAgent(tss, asp, qnet, optax.adam(2.5e-4, eps=1.5e-4),
                   epsilon_greedy=0.05, gamma=0.99,
                   target_update_tau=1.0, target_update_period=500,
                   td_errors_loss_fn=common.element_wise_huber_loss)
  replay = UniformReplay(tj.trajectory_spec(tss, asp), batch_size=B,
                         max_length=CAPACITY)
  loop = FusedTrainLoop(env, agent, replay,
                        metrics=metrics.standard_collect_metrics(20),
                        collect_steps_per_iteration=1,
                        sample_batch_size=SAMPLE)
  state = jax.jit(
      lambda k: loop.init(k, initial_collect_steps=64))(jax.random.key(0))
  float(np.asarray(state.replay_state.count))  # sync init

  CHUNK, N_TIMED = (10, 2) if smoke else (100, 4)
  run_fn = jax.jit(lambda s: loop.run(s, CHUNK))
  lowered = run_fn.lower(state)
  compiled = lowered.compile()
  try:
    xla_flops_per_chunk = float(compiled.cost_analysis()["flops"])
  except Exception:
    xla_flops_per_chunk = float("nan")

  # Analytic model FLOPs (the standard MFU numerator; XLA's cost
  # analysis undercounts convolutions by ~60x here). SAME padding,
  # ceil(dim/stride) spatial outputs; 2 FLOPs per MAC.
  def q_net_fwd_flops():
    size = env.env.size
    cin = env.env.frames
    total = 0.0
    for filters, kernel, stride in ((32, 8, 4), (64, 4, 2), (64, 3, 1)):
      size = -(-size // stride)  # ceil
      total += size * size * filters * kernel * kernel * cin * 2
      cin = filters
    flat = size * size * cin
    total += flat * 512 * 2          # fc
    total += 512 * env.env.num_actions * 2
    return total

  fwd = q_net_fwd_flops()
  # Per iteration: collect policy fwd on B rows; train = online fwd +
  # backward (~2x fwd) + target-net fwd on the sample batch.
  model_flops_per_iter = fwd * (B + 4 * SAMPLE)

  for _ in range(4):  # warmup: compile + tunnel program-load spikes
    state, losses = run_fn(state)
  float(np.asarray(losses)[-1])

  t0 = time.time()
  for _ in range(N_TIMED):
    state, losses = run_fn(state)
  float(np.asarray(losses)[-1])
  dt = time.time() - t0

  iters = CHUNK * N_TIMED
  env_steps_per_s = iters * B / dt
  train_step_ms = dt / iters * 1e3
  mfu = (model_flops_per_iter * iters / dt) / V5E_PEAK_FLOPS_BF16

  dq = jax.device_get(state.metric_states[2].deque)
  n = min(int(dq.count), dq.data.shape[0])
  avg_return = float(dq.data[:n].mean()) if n else 0.0

  return {
      "env_steps_per_s": round(env_steps_per_s, 1),
      "iteration_ms": round(train_step_ms, 3),
      "mfu": round(mfu, 4),
      "replay_capacity_frames": B * CAPACITY,
      "replay_hbm_gb": round(B * CAPACITY * (84 * 84 * 4) / 2**30, 2),
      "model_gflop_per_iteration": round(model_flops_per_iter / 1e9, 3),
      "xla_cost_analysis_gflop_per_iteration": (
          round(xla_flops_per_chunk / CHUNK / 1e9, 3)
          if np.isfinite(xla_flops_per_chunk) else None),
      "flops_note": "MFU uses analytic model FLOPs (collect fwd + train "
                    "fwd/bwd + target fwd); XLA cost analysis "
                    "undercounts convs and is reported for reference",
      "batch_rows": B,
      "sample_batch": SAMPLE,
      "obs_shape": f"{env.env.size}x{env.env.size}x{env.env.frames} uint8",
      "dtype": "bfloat16 compute",
      "avg_return_last20": round(avg_return, 2),
      "peak_flops_ref": "v5e bf16 197e12",
  }


def host_atari_replay_probe(capacity: int = 1_000_000,
                            hashed_frames: int = 100_000):
  """The 1M-frame Atari replay answer (reference mnih15 config: replay
  capacity 1e6, examples/dqn/mnih15/dqn_train_eval_atari.py): 28 GB of
  84x84x4 uint8 does NOT fit v5e HBM, so frames live in host RAM
  (PyUniformReplayBuffer / PyHashedReplayBuffer — the reference's
  py_hashed_replay_buffer analogue) and sampled batches stream to the
  device per train step. Measures, at FULL capacity:
    - vectorized ring-fill rate (frames/s)
    - random 2-step sample rate at batch 256 (batches/s, frames/s)
    - host->device transfer rate for the sampled batch
  plus the hashed (dedup) variant's add rate at `hashed_frames`.
  The mnih15 cadence needs (batch 256 sample + transfer) every 4 env
  frames; `sustains_mnih15_cadence` reports the env-frames/s this host
  path can feed."""
  from agents_tpu.replay_buffers.py_uniform_replay import (
      PyHashedReplayBuffer, PyUniformReplayBuffer)
  from agents_tpu.specs import array_spec as specs_mod
  from agents_tpu.trajectories import time_step as ts_mod
  from agents_tpu.trajectories import trajectory as tj

  obs_spec = specs_mod.ArraySpec((84, 84, 4), np.uint8)
  act_spec = specs_mod.BoundedArraySpec((), np.int32, 0, 3)
  spec = tj.trajectory_spec(ts_mod.time_step_spec(obs_spec), act_spec)

  buf = PyUniformReplayBuffer(spec, capacity,
                            reuse_sample_buffers=True)
  CHUNK = 1024
  rng = np.random.RandomState(0)
  block = jax.tree_util.tree_map(
      lambda s: (rng.randint(0, 255, (CHUNK,) + tuple(s.shape))
                 .astype(s.dtype) if np.dtype(s.dtype) == np.uint8 else
                 np.zeros((CHUNK,) + tuple(s.shape), s.dtype)), spec)
  t0 = time.time()
  for _ in range(capacity // CHUNK):
    buf.add_batch(block)
  fill_s = time.time() - t0

  SAMPLES = 40
  t0 = time.time()
  for i in range(SAMPLES):
    batch = buf.sample(256, num_steps=2,
                       rng=np.random.RandomState(i))
  sample_s = (time.time() - t0) / SAMPLES

  # host->device transfer of one sampled batch (synced via readback)
  dev_batch = jax.device_put(batch)
  float(np.asarray(jax.tree_util.tree_leaves(dev_batch)[3]).sum())
  t0 = time.time()
  for i in range(10):
    dev_batch = jax.device_put(batch)
  float(np.asarray(jax.tree_util.tree_leaves(dev_batch)[3]).sum())
  transfer_s = (time.time() - t0) / 10
  batch_bytes = sum(np.asarray(x).nbytes
                    for x in jax.tree_util.tree_leaves(batch))

  # hashed/dedup variant: per-frame content hashing bounds the add rate
  hbuf = PyHashedReplayBuffer(spec, hashed_frames,
                            reuse_sample_buffers=True)
  t0 = time.time()
  for _ in range(hashed_frames // CHUNK):
    hbuf.add_batch(block)  # CHUNK distinct frames, repeated -> dedup
  hashed_fill_s = time.time() - t0

  return {
      "capacity_frames": capacity,
      "resident_gb": round(sum(np.asarray(x).nbytes for x in
                               jax.tree_util.tree_leaves(buf._storage))
                           / 2**30, 1),
      "fill_frames_per_s": round(capacity / fill_s, 0),
      "sample_batch256_ms": round(sample_s * 1e3, 2),
      "sample_frames_per_s": round(256 * 2 / sample_s, 0),
      "host_to_device_ms": round(transfer_s * 1e3, 2),
      "host_to_device_gbps": round(batch_bytes / transfer_s / 1e9, 2),
      "hashed_add_frames_per_s": round(hashed_frames / hashed_fill_s, 0),
      "hashed_dedup_ratio": round(
          hashed_frames / max(hbuf.num_unique_observations, 1), 1),
      # mnih15 trains one batch-256 step per 4 env frames. Two cadence
      # numbers: host-side sampling only, and including the host->device
      # hop. On THIS rig the device hop crosses the axon network tunnel
      # (hundreds of ms) — a co-located v5e host rides PCIe at tens of
      # GB/s, so the host-only number is the architecture-relevant one;
      # the with-transfer number prices this sandbox's tunnel.
      "mnih15_cadence_env_frames_per_s_host_only": round(4.0 / sample_s, 0),
      "mnih15_cadence_env_frames_per_s_with_transfer": round(
          4.0 / (sample_s + transfer_s), 0),
  }


def main():
  import optax

  from agents_tpu import metrics, networks
  from agents_tpu.agents.dqn import DqnAgent
  from agents_tpu.environments.classic.cartpole import CartPole
  from agents_tpu.environments.jax_environment import BatchedJaxEnv
  from agents_tpu.replay_buffers import UniformReplay
  from agents_tpu.train import FusedTrainLoop
  from agents_tpu.trajectories import trajectory as tj
  from agents_tpu.utils import common

  # Batch sweep on v5e (B=1024: 8.1M, 2048: 14.0M, 4096: 22.0M, 8192:
  # 22.8M env-steps/s): 4096 is the knee — beyond it, per-iteration
  # latency doubles for ~4% more throughput.
  B = 4096
  env = BatchedJaxEnv(CartPole(), batch_size=B)
  tss, asp = env.time_step_spec(), env.action_spec()
  qnet = networks.make_q_network(tss.observation, asp,
                                 fc_layer_params=(100, 50))
  agent = DqnAgent(tss, asp, qnet, optax.adam(1e-3), epsilon_greedy=0.1,
                   target_update_tau=0.05, target_update_period=5,
                   gamma=0.99,
                   td_errors_loss_fn=common.element_wise_squared_loss)
  replay = UniformReplay(tj.trajectory_spec(tss, asp), batch_size=B,
                         max_length=512)
  loop = FusedTrainLoop(env, agent, replay,
                        metrics=metrics.standard_collect_metrics(20),
                        collect_steps_per_iteration=1,
                        sample_batch_size=256)

  state = jax.jit(
      lambda k: loop.init(k, initial_collect_steps=100))(jax.random.key(0))
  jax.block_until_ready(state)

  CHUNK, N_TIMED = 500, 4
  run = jax.jit(lambda s: loop.run(s, CHUNK))

  # Warmup: compile + absorb tunnel program-load spikes (can be minutes).
  # NOTE: block_until_ready is a no-op on the axon backend — only a real
  # value readback (np.asarray) synchronizes, so sync via readback.
  # Warmup also trains 4000 iterations — at B=4096 the policy reliably
  # reaches return 200 by iteration ~5000, so the timed window (2000 more)
  # ends with CartPole solved; the return check proves learning happened.
  for _ in range(8):
    state, losses = run(state)
  float(np.asarray(losses)[-1])

  # Timed: queue N_TIMED chunks back-to-back (async dispatch), then sync
  # once via readback of the final loss.
  t0 = time.time()
  for _ in range(N_TIMED):
    state, losses = run(state)
  float(np.asarray(losses)[-1])
  dt = time.time() - t0
  ITERS = CHUNK * N_TIMED
  env_steps_per_s = ITERS * B / dt

  dq = jax.device_get(state.metric_states[2].deque)
  n = min(int(dq.count), dq.data.shape[0])
  avg_return = float(dq.data[:n].mean()) if n else 0.0

  # Capacity sweep: the round-3 number ran a 65k-frame ring; the
  # realistic on-HBM point is 262k frames (7.4 GB). Both measured live.
  conv = {}
  for cap in (512, 2048):
    try:
      conv[f"capacity_{128 * cap // 1000}k_frames"] = conv_bench(cap)
    except Exception as e:  # keep the headline metric robust
      conv[f"capacity_{128 * cap // 1000}k_frames"] = {
          "error": f"{type(e).__name__}: {e}"}
  try:
    host_replay = host_atari_replay_probe()
  except Exception as e:
    host_replay = {"error": f"{type(e).__name__}: {e}"}
  try:
    sac_live = sac_live_probe()
  except Exception as e:
    sac_live = {"error": f"{type(e).__name__}: {e}"}

  solved = avg_return >= 195.0
  value = env_steps_per_s if solved else 0.0
  print(json.dumps({
      "metric": "dqn_cartpole_fused_env_steps_per_s",
      "value": round(value, 1),
      "unit": "env-steps/s/chip (0 if return<195)",
      "vs_baseline": round(value / TF_AGENTS_CPU_ENV_STEPS_PER_S, 2),
      "detail": {
          "avg_return_last20": round(avg_return, 1),
          "timed_iterations": ITERS,
          "batch_size": B,
          "train_steps_per_env_batch_step": 1,
          "wall_s": round(dt, 2),
          # Second headline: SAC HalfCheetah-v5 wall-clock-to-return at
          # the reference operating point (UTD 1.0, haarnoja18 config,
          # greedy 30-episode eval), from the committed artifact
          # results/sac_halfcheetah_1m_utd1_eval.jsonl run on this chip
          # (examples/sac_halfcheetah.py). Reference: 12,096 @ 1M on
          # HalfCheetah-v2, PerfZero window [800, 16000]
          # (benchmark/sac_benchmark.py:64-75); wall-clock hours on GPU.
          "sac_halfcheetah": {
              "greedy_eval_return_at_3m": 15864.2,
              "greedy_eval_return_at_1m_same_run": 11944.1,
              "wall_minutes_3m": 107.3,
              "reference_3m": 14877.0,
              "reference_1m_mean": 12096.0,
              "note": "committed artifact results/sac_halfcheetah_3m_s0"
                      ".jsonl (single chip + 2-core host MuJoCo, UTD "
                      "1.0, greedy 30-episode evals); live throughput "
                      "guard below",
          },
          # Third headline: Atari-scale conv path (mnih15 shapes) with
          # MFU, measured live on this chip at two ring capacities
          # (65k and 262k frames — VERDICT r3 item 2), plus the
          # host-RAM path that holds the reference's full 1M frames.
          "atari_conv_mnih15": conv,
          "atari_host_replay_1m": host_replay,
          # Live SAC throughput probe (regression guard on wall-clock;
          # the curve numbers above are committed artifacts).
          "sac_halfcheetah_live_throughput": sac_live,
      },
  }))


if __name__ == "__main__":
  main()
