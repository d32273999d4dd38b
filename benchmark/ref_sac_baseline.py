"""Run the reference TF-Agents SAC on MuJoCo v5 physics (CPU) and log its
learning curve + throughput.

Purpose (round-4 verdict #2): the committed Walker2d/Hopper artifacts sit
at 0.81x/0.88x of the reference's published *v2-physics* means
(examples/sac/README.md:63-64), explained so far only by a cited-but-
unmeasured v2->v5 offset. This binary measures that offset directly: the
reference's own SAC — its SacAgent, its TanhNormalProjectionNetwork, its
sequential actor/critic construction, its in-graph driver/replay — on the
SAME Walker2d-v5/Hopper-v5 gymnasium physics our artifacts use. It also
records the reference's CPU env-steps/s, the missing denominator for
BASELINE.json's >=10x-per-chip target on SAC.

Faithful to tf_agents/examples/sac/haarnoja18/sac_train_eval.py:
actor (256,256) + TanhNormalProjection, critic joint (256,256) (glorot
uniform, relu), Adam 3e-4 x3, batch 256, tau 0.005/period 1, gamma 0.99,
reward_scale 0.1, initial_collect 1000 (walker_2d.gin/hopper.gin), one
env step + one train step per iteration (UTD 1). Deviations, all on the
measurement rig side: TFUniformReplayBuffer instead of a Reverb server
(absent from the image; same uniform 2-step sampling semantics), greedy
eval 30 episodes every eval_interval like the reference but from a
capped-step runner, and single-threaded TF so the probe can share the
host with a TPU run. tfp is the benchmark/stubs mini-implementation
(real Normal/MVN-diag/Tanh-chain change-of-variables math — validated
against closed forms in tests/test_ref_stub_math.py).

Usage:
  python benchmark/ref_sac_baseline.py Walker2d-v5 250000 /tmp/out.jsonl
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "stubs"))
sys.path.insert(0, "/root/reference")

# Keras 2 (tf_keras): what the reference era targets — Keras 3 breaks
# SacAgent's tape.watch (keras.Variable is not a tf.Variable) and cannot
# clone the reference's Lambda layers for target critics.
os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")

import numpy as np
import tensorflow as tf

if os.environ.get("REF_SAC_SINGLE_THREAD", "1") == "1":
  # Default single-threaded so the curve runs can share the host with a
  # TPU training job; REF_SAC_SINGLE_THREAD=0 gives TF its default
  # threading for a best-case throughput measurement on an idle host.
  tf.config.threading.set_intra_op_parallelism_threads(1)
  tf.config.threading.set_inter_op_parallelism_threads(1)

from tf_agents.agents.ddpg import critic_network  # noqa: F401 (parity ref)
from tf_agents.agents.sac import sac_agent
from tf_agents.agents.sac import tanh_normal_projection_network
from tf_agents.drivers import dynamic_step_driver
from tf_agents.environments import py_environment, tf_py_environment
from tf_agents.networks import nest_map, sequential
from tf_agents.policies import random_tf_policy
from tf_agents.replay_buffers import tf_uniform_replay_buffer
from tf_agents.specs import array_spec
from tf_agents.trajectories import time_step as ts
from tf_agents.utils import common

import gymnasium


class MujocoPyEnv(py_environment.PyEnvironment):
  """gymnasium MuJoCo v5 env behind the reference PyEnvironment protocol
  (suite_mujoco.load equivalent for this image's gymnasium API)."""

  def __init__(self, name):
    super().__init__()
    self._env = gymnasium.make(name)
    obs_dim = self._env.observation_space.shape[0]
    act_space = self._env.action_space
    self._obs_spec = array_spec.ArraySpec((obs_dim,), np.float32,
                                          name="observation")
    self._action_spec = array_spec.BoundedArraySpec(
        act_space.shape, np.float32, minimum=act_space.low,
        maximum=act_space.high, name="action")
    self._done = True

  def observation_spec(self):
    return self._obs_spec

  def action_spec(self):
    return self._action_spec

  def _reset(self):
    obs, _ = self._env.reset()
    self._done = False
    return ts.restart(np.asarray(obs, np.float32))

  def _step(self, action):
    if self._done:
      return self._reset()
    obs, reward, terminated, truncated, _ = self._env.step(
        np.asarray(action, np.float64))
    obs = np.asarray(obs, np.float32)
    self._done = terminated or truncated
    if terminated:
      return ts.termination(obs, reward)
    if truncated:
      return ts.truncation(obs, reward)
    return ts.transition(obs, reward)


# -- reference haarnoja18 network construction (sac_train_eval.py:75-172) --
# Keras-3 note: the reference uses Lambda layers; SacAgent's target-network
# copy round-trips layer configs, and Keras 3 cannot deserialize Lambda
# closures. These registered layers are the serializable equivalents.
@tf.keras.utils.register_keras_serializable("ref_sac")
class ConcatObsAction(tf.keras.layers.Layer):
  """(observation, action) tuple -> concat along features (the Split ->
  NestMap(identity) -> NestFlatten -> Concatenate stack collapsed)."""

  def call(self, inputs):
    return tf.concat([inputs[0], inputs[1]], axis=-1)


@tf.keras.utils.register_keras_serializable("ref_sac")
class SqueezeValue(tf.keras.layers.Layer):
  """InnerReshape([1] -> []) equivalent (that helper builds a Lambda,
  which Keras 3 cannot clone for the target critics)."""

  def call(self, inputs):
    return tf.squeeze(inputs, axis=-1)


def _dense(units):
  return tf.keras.layers.Dense(
      units, activation=tf.keras.activations.relu,
      kernel_initializer="glorot_uniform")


def make_critic_net(joint_units=(256, 256)):
  # Flattened (no nested Sequential): Keras 3 target-net cloning can't
  # resolve tf_agents' Sequential by registered name; same layer stack.
  return sequential.Sequential(
      [ConcatObsAction()] + [_dense(u) for u in joint_units] + [
          tf.keras.layers.Dense(1, kernel_initializer="glorot_uniform"),
          SqueezeValue(),
      ], name="sequential_critic")


# Target-network cloning round-trips layer configs; make the tf_agents
# layer classes resolvable in Keras 3's registry.
tf.keras.utils.get_custom_objects().update({
    "Sequential": sequential.Sequential,
})


class _TanhProjWrapper(
    tanh_normal_projection_network.TanhNormalProjectionNetwork):

  def __init__(self, sample_spec):
    super().__init__(sample_spec)

  def call(self, inputs, network_state=(), **kwargs):
    kwargs["outer_rank"] = 1
    kwargs.pop("step_type", None)
    return super().call(inputs, **kwargs)


def make_actor_net(action_spec, fc_units=(256, 256)):
  # Flat (non-nested) MuJoCo action spec: the reference's tile_as_nest +
  # NestMap generality reduces to chaining the projection directly.
  return sequential.Sequential(
      [_dense(u) for u in fc_units] + [_TanhProjWrapper(action_spec)])


def main():
  env_name = sys.argv[1] if len(sys.argv) > 1 else "Walker2d-v5"
  total_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 250_000
  out_path = (sys.argv[3] if len(sys.argv) > 3
              else f"/tmp/ref_sac_{env_name}.jsonl")
  eval_interval = int(os.environ.get("REF_SAC_EVAL_INTERVAL", 25_000))
  eval_episodes = int(os.environ.get("REF_SAC_EVAL_EPISODES", 30))

  tf_env = tf_py_environment.TFPyEnvironment(MujocoPyEnv(env_name))
  eval_env = tf_py_environment.TFPyEnvironment(MujocoPyEnv(env_name))
  obs_spec, action_spec = tf_env.observation_spec(), tf_env.action_spec()

  agent = sac_agent.SacAgent(
      tf_env.time_step_spec(), action_spec,
      actor_network=make_actor_net(action_spec),
      critic_network=make_critic_net(),
      actor_optimizer=tf.keras.optimizers.Adam(3e-4),
      critic_optimizer=tf.keras.optimizers.Adam(3e-4),
      alpha_optimizer=tf.keras.optimizers.Adam(3e-4),
      target_update_tau=0.005, target_update_period=1,
      td_errors_loss_fn=tf.math.squared_difference,
      gamma=0.99, reward_scale_factor=0.1,
      train_step_counter=tf.Variable(0, dtype=tf.int64))
  agent.initialize()

  replay = tf_uniform_replay_buffer.TFUniformReplayBuffer(
      agent.collect_data_spec, batch_size=1, max_length=total_steps + 1000)

  initial_driver = dynamic_step_driver.DynamicStepDriver(
      tf_env, random_tf_policy.RandomTFPolicy(tf_env.time_step_spec(),
                                              action_spec),
      observers=[replay.add_batch], num_steps=1000)
  initial_driver.run = common.function(initial_driver.run)

  collect_driver = dynamic_step_driver.DynamicStepDriver(
      tf_env, agent.collect_policy, observers=[replay.add_batch],
      num_steps=1)
  collect_driver.run = common.function(collect_driver.run)
  agent.train = common.function(agent.train)

  dataset = replay.as_dataset(sample_batch_size=256, num_steps=2,
                              num_parallel_calls=2).prefetch(3)
  it = iter(dataset)

  def greedy_eval():
    total = 0.0
    for _ in range(eval_episodes):
      time_step = eval_env.reset()
      while not bool(time_step.is_last()):
        action_step = agent.policy.action(time_step)
        time_step = eval_env.step(action_step.action)
        total += float(time_step.reward.numpy()[0])
    return total / eval_episodes

  out = open(out_path, "a")

  def log(step, **kv):
    rec = {"step": int(step), "t": time.time(), **kv}
    out.write(json.dumps(rec) + "\n")
    out.flush()
    print(rec, flush=True)

  initial_driver.run()
  time_step, policy_state = None, None
  t0 = time.time()
  for step in range(total_steps):
    time_step, policy_state = collect_driver.run(time_step, policy_state)
    experience, _ = next(it)
    loss = agent.train(experience)
    if (step + 1) % 5000 == 0:
      sps = (step + 1) / (time.time() - t0)
      log(step + 1, env_steps_per_s=round(sps, 2),
          loss=float(loss.loss.numpy()))
    if (step + 1) % eval_interval == 0:
      log(step + 1, EvalAverageReturn=greedy_eval())
  log(total_steps, EvalAverageReturn=greedy_eval(), final=True,
      env_steps_per_s=round(total_steps / (time.time() - t0), 2))


if __name__ == "__main__":
  main()
