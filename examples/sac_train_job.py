"""Distributed SAC: learner job (owns the ingest rings + the chip).

Analogue of
``tf_agents/experimental/distributed/examples/sac/sac_train.py`` plus
``sac_reverb_server.py``: this process owns the experience store (the
shm rings created here play Reverb's server role — MinSize rate limiting
becomes "wait until min_replay_items drained") and the device. Collect
jobs (`sac_collect_job.py`) attach to the rings by name; weight broadcast
is a periodic collect-policy export that actors poll
(ReverbVariableContainer.push -> PolicySaver.save_checkpoint).

Each drained record is an independent [2, ...] trajectory pair, so the
device replay samples with num_steps=1 and hands [B, 2] sequences
straight to `SacAgent.train` — no sequence reconstruction.

Usage (start this first, then N collect jobs, then optionally eval_job):
  python examples/sac_train_job.py --root_dir=/tmp/agents_tpu/dist_sac \
      --rings=sac_ring_0,sac_ring_1 --env_name=Pendulum-v1

Smoke (spawns 2 collect subprocesses + trains a few hundred steps):
  python examples/sac_train_job.py --smoke
"""
import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("--root_dir", default="/tmp/agents_tpu/dist_sac")
  parser.add_argument("--rings", default="sac_ring_0")
  parser.add_argument("--env_name", default="Pendulum-v1")
  parser.add_argument("--ring_capacity", type=int, default=1 << 15)
  parser.add_argument("--replay_rows", type=int, default=256,
                      help="replay row width = frames added per insert")
  parser.add_argument("--replay_max_length", type=int, default=512)
  parser.add_argument("--sample_batch_size", type=int, default=256)
  parser.add_argument("--train_steps_per_call", type=int, default=8)
  parser.add_argument("--min_replay_items", type=int, default=512)
  parser.add_argument("--samples_per_insert", type=float, default=0.0,
                      help="Reverb SampleToInsertRatio gating: target "
                      "sampled-items per ingested item; 0 = MinSize only")
  parser.add_argument("--sample_insert_error_buffer", type=float,
                      default=0.0, help="ratio slack in samples; 0 = auto")
  parser.add_argument("--total_train_steps", type=int, default=10000)
  parser.add_argument("--export_interval_steps", type=int, default=200)
  parser.add_argument("--weights_shm", default="",
                      help="also publish collect-policy weights to this "
                      "shm variable container every export interval "
                      "(collectors pass the same name)")
  parser.add_argument("--force_unlink_shm", action="store_true",
                      help="remove a pre-existing --weights_shm segment "
                      "before creating (stale segment from a crashed "
                      "run); without it, a live segment is an error so a "
                      "duplicate learner can never orphan collectors")
  parser.add_argument("--log_interval_steps", type=int, default=400)
  parser.add_argument("--seed", type=int, default=0)
  parser.add_argument("--smoke", action="store_true")
  args = parser.parse_args()

  if args.smoke:
    args.total_train_steps = 200
    args.min_replay_items = 64
    args.export_interval_steps = 50
    args.log_interval_steps = 50
    args.rings = "sac_smoke_0,sac_smoke_1"

  import jax
  import numpy as np

  from agents_tpu.policies.policy_saver import PolicySaver
  from agents_tpu.replay_buffers import UniformReplay
  from agents_tpu.replay_buffers.host_ingest import IngestServer
  from agents_tpu.specs import array_spec
  from agents_tpu.trajectories import trajectory as tj
  from examples.sac_collect_job import build_agent

  agent, tss, asp = build_agent(args.env_name, args.seed)
  traj_spec = tj.trajectory_spec(tss, asp)
  pair_spec = array_spec.add_outer_dims_nest(traj_spec, (2,))

  ring_names = args.rings.split(",")
  servers = [IngestServer(n, pair_spec, capacity=args.ring_capacity)
             for n in ring_names]

  collectors = []
  if args.smoke:
    # Actors force JAX_PLATFORMS=cpu internally, so they never contend
    # for this process's device.
    for n in ring_names:
      cmd = [
          sys.executable,
          os.path.join(os.path.dirname(__file__), "sac_collect_job.py"),
          f"--root_dir={args.root_dir}", f"--ring={n}",
          f"--env_name={args.env_name}", "--env_batch_size=4",
          "--total_ticks=0", "--random_ticks=8",
          "--policy_poll_ticks=16",
      ]
      if args.weights_shm:
        cmd.append(f"--weights_shm={args.weights_shm}")
      collectors.append(subprocess.Popen(cmd))

  replay = UniformReplay(pair_spec, batch_size=args.replay_rows,
                         max_length=args.replay_max_length)
  replay_state = replay.init()
  agent_state = agent.init(jax.random.key(args.seed))
  add_batch = jax.jit(replay.add_batch)

  def train_chunk(ag, rs, key):
    def one(a, k):
      exp, _ = replay.sample(rs, k, args.sample_batch_size)
      a, loss = agent.train(a, exp)
      return a, loss.loss
    ks = jax.random.split(key, args.train_steps_per_call)
    ag, losses = jax.lax.scan(one, ag, ks)
    return ag, losses[-1]

  train_chunk = jax.jit(train_chunk)

  saver = PolicySaver(agent.collect_policy)
  export_dir = os.path.join(args.root_dir, "policies", "collect_policy")
  greedy_dir = os.path.join(args.root_dir, "policies", "greedy_policy")
  greedy_saver = PolicySaver(agent.policy)

  weights_vc = None
  if args.weights_shm:
    from agents_tpu.train.variable_container import VariableContainer
    # create refuses to replace an existing segment (a duplicate learner
    # would silently orphan collectors mmap'ed to the old one); stale
    # segments from a crashed run are cleared only on explicit request.
    if args.force_unlink_shm:
      VariableContainer.unlink_name(args.weights_shm)
    weights_vc = VariableContainer(
        args.weights_shm, agent.collect_policy_params(agent_state),
        create=True)
    # Publish the init weights immediately so collectors switch off the
    # random policy without waiting for the first export interval.
    weights_vc.push(
        jax.device_get(agent.collect_policy_params(agent_state)), 0)

  # Host-side staging FIFO: drained frames accumulate here and flush to
  # the device replay in fixed [replay_rows, 2, ...] blocks (static
  # shapes keep one compiled insert program).
  staged = []
  staged_count = 0

  def drain_all():
    nonlocal staged, staged_count
    got = 0
    for s in servers:
      out = s.drain(max_frames=4096)
      if out is not None:
        n = jax.tree_util.tree_leaves(out)[0].shape[0]
        staged.append(out)
        staged_count += n
        got += n
    return got

  def flush_staged(rs):
    nonlocal staged, staged_count
    while staged_count >= args.replay_rows:
      flat = jax.tree_util.tree_map(
          lambda *xs: np.concatenate(xs, axis=0), *staged)
      block = jax.tree_util.tree_map(
          lambda x: x[:args.replay_rows], flat)
      rest = jax.tree_util.tree_map(
          lambda x: x[args.replay_rows:], flat)
      rs = add_batch(rs, block)
      staged = [rest]
      staged_count -= args.replay_rows
    return rs

  total_items, train_steps = 0, 0
  key = jax.random.key(args.seed + 1)
  print(json.dumps({"job": "train", "waiting_for_items":
                    args.min_replay_items}), flush=True)

  # Reverb-style rate limiting (replay_buffer_utils.py:29-56): MinSize
  # blocks the first sample until the actors have written the initial
  # collect; SampleToInsertRatio additionally paces the trainer against
  # ingest (fast trainer waits instead of spinning on a stale buffer;
  # fast actors see a full ring once drains pause and block in
  # push_blocking).
  from agents_tpu.replay_buffers.rate_limiter import (MinSize,
                                                      SampleToInsertRatio)
  samples_per_chunk = args.train_steps_per_call * args.sample_batch_size
  if args.samples_per_insert > 0:
    eb = args.sample_insert_error_buffer or 2.0 * max(
        samples_per_chunk, args.samples_per_insert)
    # The window must cover one full sample chunk plus one insert, or the
    # trainer live-locks: can_sample(chunk) needs diff >= min_diff + chunk
    # while drain_gated stops inserting at diff + spi > max_diff.
    min_eb = 0.5 * (samples_per_chunk + args.samples_per_insert) + 1.0
    if eb < min_eb:
      print(json.dumps({"job": "train", "warning":
                        f"sample_insert_error_buffer {eb} too small for "
                        f"chunked sampling; clamped to {min_eb}"}),
            flush=True)
      eb = min_eb
    limiter = SampleToInsertRatio(args.samples_per_insert,
                                  args.min_replay_items, eb)
  else:
    limiter = MinSize(args.min_replay_items)

  def drain_gated():
    nonlocal total_items
    if not limiter.can_insert(1):
      return 0
    got = drain_all()
    if got:
      limiter.record_insert(got)
      total_items += got
    return got

  t0 = time.time()
  last_export = 0
  while train_steps < args.total_train_steps:
    # Drain while allowed, then wait for the limiter to clear sampling.
    drain_gated()
    replay_state = flush_staged(replay_state)
    while not limiter.can_sample(samples_per_chunk):
      if drain_gated() == 0:
        time.sleep(0.01)
      replay_state = flush_staged(replay_state)
    limiter.record_sample(samples_per_chunk)
    key, sub = jax.random.split(key)
    agent_state, loss = train_chunk(agent_state, replay_state, sub)
    train_steps += args.train_steps_per_call
    if train_steps - last_export >= args.export_interval_steps:
      # First export writes the full artifact (incl. the StableHLO
      # module); every subsequent interval refreshes params + the
      # manifest train_step only — the manifest train_step is what
      # actors poll to detect fresh weights (the variable-container
      # "push" signal), and re-exporting StableHLO per interval would
      # re-trace two policies inside the learner hot loop.
      saver.train_step = train_steps
      greedy_saver.train_step = train_steps
      # Gate PER DIRECTORY, not once for both: a crash between the two
      # full saves (or a restart into a half-written export root) must
      # still give each dir its manifest + StableHLO artifact before
      # params-only refreshes start — otherwise actors polling the
      # greedy manifest would never see weights at all.
      # Additionally, the first export of THIS process is always a full
      # save: a restarted job with a changed network must not refresh
      # params under a stale StableHLO blob/spec manifest.
      for a_saver, a_dir, a_params in (
          (saver, export_dir, agent.collect_policy_params(agent_state)),
          (greedy_saver, greedy_dir, agent.policy_params(agent_state))):
        if last_export > 0 and os.path.exists(
            os.path.join(a_dir, "policy_manifest.json")):
          a_saver.save_checkpoint(a_dir, a_params)
        else:
          a_saver.save(a_dir, a_params)
      if weights_vc is not None:
        weights_vc.push(
            jax.device_get(agent.collect_policy_params(agent_state)),
            train_steps)
      last_export = train_steps
    if train_steps % args.log_interval_steps < args.train_steps_per_call:
      print(json.dumps({
          "job": "train", "train_steps": train_steps,
          "items_ingested": int(total_items),
          "dropped": sum(s.dropped() for s in servers),
          "loss": float(np.asarray(loss)),
          "train_steps_per_s": round(train_steps / (time.time() - t0), 1),
      }), flush=True)

  loss_f = float(np.asarray(loss))
  for p in collectors:
    p.terminate()
    p.wait(timeout=10)
  for s in servers:
    s.close()
  if weights_vc is not None:
    weights_vc.close()
    weights_vc.unlink()
  print(json.dumps({"job": "train", "done": True,
                    "train_steps": train_steps,
                    "items_ingested": int(total_items),
                    "final_loss": loss_f}), flush=True)
  assert np.isfinite(loss_f)


if __name__ == "__main__":
  main()
