"""Standalone evaluation job: polls exported policies and evaluates them.

Analogue of ``tf_agents/experimental/distributed/examples/eval_job.py:207``
(SavedModel polling evaluator): waits for a policy export under
``root_dir/policies/greedy_policy``, reloads params whenever the exported
train_step advances, and runs eval episodes on a host env.

Usage (alongside a training job writing policy exports):
  python examples/eval_job.py --root_dir=/tmp/agents_tpu/sac_halfcheetah \
      --env_name=HalfCheetah-v5 --eval_episodes=5
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("--root_dir", required=True)
  parser.add_argument("--env_name", default="HalfCheetah-v5")
  parser.add_argument("--eval_episodes", type=int, default=5)
  parser.add_argument("--poll_secs", type=float, default=5.0)
  parser.add_argument("--max_evals", type=int, default=0,
                      help="stop after N evals (0 = forever)")
  args = parser.parse_args()

  import jax
  import numpy as np
  import optax

  from agents_tpu import networks
  from agents_tpu.environments import suite_gym
  from agents_tpu.eval.metric_utils import compute
  from agents_tpu.metrics import py_metrics
  from agents_tpu.policies import policy_saver as ps_lib
  from agents_tpu.train.train_utils import wait_for_policy

  policy_dir = os.path.join(args.root_dir, "policies", "greedy_policy")
  print(f"waiting for policy at {policy_dir}", flush=True)
  assert wait_for_policy(policy_dir, timeout_secs=None)

  env = suite_gym.load(args.env_name)
  tss, asp = env.time_step_spec(), env.action_spec()
  # Rebuild the network architecture (policy graphs are code, params are
  # data — see policy_saver docstring).
  from agents_tpu.agents.sac import SacAgent
  agent = SacAgent(
      tss, asp,
      critic_network=networks.make_critic_network(tss.observation, asp),
      actor_network=networks.make_sac_actor_network(tss.observation, asp),
      actor_optimizer=optax.adam(1e-3), critic_optimizer=optax.adam(1e-3),
      alpha_optimizer=optax.adam(1e-3))
  template = agent.policy_params(agent.init(jax.random.key(0)))
  loaded = ps_lib.load_policy(policy_dir, agent.policy, template)

  last_step, evals = -1, 0
  while True:
    manifest = ps_lib.load_manifest(policy_dir)
    if manifest["train_step"] != last_step:
      loaded.update_from_checkpoint()
      last_step = manifest["train_step"]
      metrics = [py_metrics.AverageReturnMetric(args.eval_episodes),
                 py_metrics.AverageEpisodeLengthMetric(args.eval_episodes)]

      class _Batched:
        def action(self, time_step, state=()):
          import jax as _jax
          batched = _jax.tree_util.tree_map(
              lambda x: np.asarray(x)[None], time_step)
          step = loaded.action(batched, state)
          return step.replace(action=_jax.tree_util.tree_map(
              lambda a: np.asarray(a)[0], step.action))

        def init_state(self, batch_size=None):
          return ()

      results = compute(metrics, env, _Batched(),
                        num_episodes=args.eval_episodes)
      print(json.dumps({"train_step": last_step, **results}), flush=True)
      evals += 1
      if args.max_evals and evals >= args.max_evals:
        break
    time.sleep(args.poll_secs)


if __name__ == "__main__":
  main()
