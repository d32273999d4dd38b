"""Distributed SAC: standalone collect job (actor process).

Analogue of
``tf_agents/experimental/distributed/examples/sac/sac_collect.py:78``:
an independent actor process that steps host envs with the latest
exported collect policy and streams experience to the learner. The
transport differences from the reference:

  - Reverb gRPC table        -> native lock-free shm ring
    (`native/ingest/ingest.cc`, one ring per actor; the learner owns the
    server side, so there is no separate "server" binary — the ring IS
    sac_reverb_server.py).
  - ReverbAddTrajectoryObserver(sequence_length=2, stride=1)
                             -> each tick pushes the overlapping pair
    (frame[t-1], frame[t]) as one [2, ...] record, so replay rows are
    independent 2-step items and the learner needs no cross-row
    time adjacency.
  - ReverbVariableContainer.update -> poll the learner's policy export
    dir and `update_from_checkpoint` (sac_collect.py:120 equivalent).

Actors are CPU hosts: this process forces JAX onto CPU so it never
contends for the learner's chip.

Usage:
  python examples/sac_collect_job.py --root_dir=/tmp/agents_tpu/dist_sac \
      --ring=sac_ring_0 --env_name=Pendulum-v1 --env_batch_size=8
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)


def build_agent(env_name: str, seed: int = 0):
  """The network architecture is code shared by all jobs; params flow
  through policy exports (policy_saver.py docstring)."""
  import optax

  from agents_tpu import networks
  from agents_tpu.agents.sac import SacAgent
  from agents_tpu.environments import suite_gym

  env = suite_gym.load(env_name)
  tss, asp = env.time_step_spec(), env.action_spec()
  agent = SacAgent(
      tss, asp,
      critic_network=networks.make_critic_network(tss.observation, asp),
      actor_network=networks.make_sac_actor_network(tss.observation, asp),
      actor_optimizer=optax.adam(3e-4), critic_optimizer=optax.adam(3e-4),
      alpha_optimizer=optax.adam(3e-4))
  env.close()
  return agent, tss, asp


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("--root_dir", required=True)
  parser.add_argument("--ring", default="sac_ring_0")
  parser.add_argument("--env_name", default="Pendulum-v1")
  parser.add_argument("--env_batch_size", type=int, default=8)
  parser.add_argument("--total_ticks", type=int, default=0,
                      help="env batch steps to run (0 = forever)")
  parser.add_argument("--policy_poll_ticks", type=int, default=64)
  parser.add_argument("--weights_shm", default="",
                      help="shm variable-container name published by the "
                      "train job (train/variable_container.py); when set, "
                      "weights come from shared memory (microseconds) "
                      "instead of policy-file polling")
  parser.add_argument("--random_ticks", type=int, default=32,
                      help="ticks of uniform-random actions before the "
                      "first policy export arrives")
  parser.add_argument("--seed", type=int, default=0)
  args = parser.parse_args()

  import jax
  import numpy as np

  from agents_tpu.environments.batched_py_environment import (
      BatchedPyEnvironment)
  from agents_tpu.environments import suite_gym
  from agents_tpu.policies import policy_saver as ps_lib
  from agents_tpu.policies.jitted_py_policy import JittedPyPolicy
  from agents_tpu.replay_buffers.host_ingest import IngestClient
  from agents_tpu.specs import array_spec
  from agents_tpu.trajectories import policy_step as ps
  from agents_tpu.trajectories import trajectory as tj

  agent, tss, asp = build_agent(args.env_name, args.seed)
  traj_spec = tj.trajectory_spec(tss, asp)
  pair_spec = array_spec.add_outer_dims_nest(traj_spec, (2,))

  env = BatchedPyEnvironment([
      suite_gym.load(args.env_name) for _ in range(args.env_batch_size)])
  client = IngestClient(args.ring, pair_spec)

  policy_dir = os.path.join(args.root_dir, "policies", "collect_policy")
  py_policy = JittedPyPolicy(
      agent.collect_policy,
      agent.collect_policy_params(agent.init(jax.random.key(args.seed))))
  rng = np.random.RandomState(args.seed)
  last_step = -1

  weights_vc = None

  def maybe_refresh_policy():
    nonlocal last_step, weights_vc
    if args.weights_shm:
      # Fast path: newest snapshot from the learner's shm container.
      from agents_tpu.train.variable_container import VariableContainer
      if weights_vc is None:
        try:
          weights_vc = VariableContainer(
              args.weights_shm, py_policy.params, create=False)
        except OSError:
          return False              # learner hasn't created it yet
      out = weights_vc.pull()
      if out is None:
        return False
      params, step = out
      if step != last_step:
        py_policy.update_params(params)
        last_step = step
      return True
    manifest_path = os.path.join(policy_dir, "policy_manifest.json")
    if not os.path.exists(manifest_path):
      return False
    manifest = ps_lib.load_manifest(policy_dir)
    if manifest["train_step"] != last_step:
      loaded = ps_lib.load_policy(policy_dir, agent.collect_policy,
                                  py_policy.params)
      py_policy.update_params(loaded.params)
      last_step = manifest["train_step"]
    return True

  def random_action():
    return array_spec.map_spec_nest(
        lambda s: rng.uniform(s.minimum, s.maximum,
                              size=(args.env_batch_size,) + s.shape
                              ).astype(s.dtype), asp)

  have_policy = maybe_refresh_policy()
  time_step = env.reset()
  prev_frame = None
  tick, pushed, t0 = 0, 0, time.time()
  while args.total_ticks == 0 or tick < args.total_ticks:
    if tick % args.policy_poll_ticks == 0:
      have_policy = maybe_refresh_policy()
    if have_policy and tick >= args.random_ticks:
      action = np.asarray(py_policy.action(time_step).action)
    else:
      action = random_action()
    next_ts = env.step(action)
    frame = tj.from_transition(time_step, ps.PolicyStep(action=action),
                               next_ts)
    if prev_frame is not None:
      pair = jax.tree_util.tree_map(
          lambda a, b: np.stack([np.asarray(a), np.asarray(b)], axis=1),
          prev_frame, frame)
      # Blocking push = Reverb-style producer backpressure: a full ring
      # means the learner is behind, so wait (bounding policy staleness)
      # instead of dropping experience; the timeout keeps the actor
      # responsive to policy refreshes if the learner dies.
      pushed += client.push_blocking(pair, timeout=10.0)
    prev_frame = frame
    time_step = next_ts
    tick += 1
    if tick % 256 == 0:
      print(json.dumps({
          "job": "collect", "ring": args.ring, "tick": tick,
          "pushed_items": pushed, "policy_train_step": last_step,
          "env_steps_per_s": round(
              tick * args.env_batch_size / (time.time() - t0), 1),
      }), flush=True)
  client.close()
  print(json.dumps({"job": "collect", "done": True, "ticks": tick,
                    "pushed_items": pushed}), flush=True)


if __name__ == "__main__":
  main()
