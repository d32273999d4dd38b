"""Offline CQL-SAC live window: the collect -> dataset -> offline-train ->
eval pipeline of ``examples/cql_sac_offline.py`` at a suite-runnable
budget on the device Pendulum (the reference pipeline is
``tf_agents/examples/cql_sac/kumar20/cql_sac_train_eval.py``: D4RL ->
reverb -> transition windows -> CqlSacAgent -> eager_compute)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from agents_tpu import metrics, networks
from agents_tpu.agents.cql import CqlSacAgent
from agents_tpu.agents.sac import SacAgent
from agents_tpu.environments.classic.pendulum import Pendulum
from agents_tpu.environments.jax_environment import BatchedJaxEnv
from agents_tpu.eval import metric_utils
from agents_tpu.replay_buffers import UniformReplay
from agents_tpu.train import FusedTrainLoop
from agents_tpu.trajectories import trajectory as tj
from agents_tpu.utils import dataset_io

B = 8


def _sac_kwargs(tss, asp, cql_actor_lr=False):
  return dict(
      critic_network=networks.make_critic_network(
          tss.observation, asp, joint_fc_layer_params=(64, 64)),
      actor_network=networks.make_sac_actor_network(
          tss.observation, asp, fc_layer_params=(64, 64)),
      actor_optimizer=optax.adam(3e-4),
      critic_optimizer=optax.adam(3e-4),
      alpha_optimizer=optax.adam(3e-4),
      target_update_tau=0.005, reward_scale_factor=1.0)


def test_cql_offline_pipeline_learns(tmp_path):
  env = BatchedJaxEnv(Pendulum(), batch_size=B)
  tss, asp = env.time_step_spec(), env.action_spec()
  data_spec = tj.trajectory_spec(tss, asp)

  # -- phase A: medium behavior policy (brief SAC) -------------------------
  behavior = SacAgent(tss, asp, **_sac_kwargs(tss, asp))
  replay = UniformReplay(data_spec, batch_size=B, max_length=4096)
  loop = FusedTrainLoop(env, behavior, replay,
                        metrics=metrics.standard_collect_metrics(20),
                        collect_steps_per_iteration=1,
                        sample_batch_size=128,
                        train_steps_per_iteration=2)
  state = jax.jit(lambda k: loop.init(k, initial_collect_steps=128))(
      jax.random.key(0))
  run = jax.jit(lambda s: loop.run(s, 250))
  for _ in range(24):  # up to 6k collect steps, 12k train steps
    state, _ = run(state)
    if float(np.asarray(loop.results(state)["AverageReturn"])) > -250:
      break

  def greedy_eval(agent, params):
    out = metric_utils.evaluate_jax_env_episodes(
        env, agent.policy, params, jax.random.key(7), num_episodes=10,
        max_steps=600)
    return float(out["AverageReturn"])

  behavior_return = greedy_eval(
      behavior, behavior.policy_params(state.agent_state))
  assert behavior_return > -1000  # learned something (random ~ -1500)

  # -- phase B: collect a low-noise "medium" dataset and persist it --------
  # A fresh collect pass with small Gaussian exploration around the greedy
  # behavior policy (the D4RL "medium" recipe at suite scale; the raw SAC
  # collect policy's entropy on Pendulum is too high to clone from).
  from agents_tpu.drivers.jax_driver import JaxDriver
  from agents_tpu.policies.wrappers import GaussianPolicy, GreedyPolicy

  T = 2048
  data_policy = GaussianPolicy(GreedyPolicy(behavior.policy), scale=0.1)
  data_replay = UniformReplay(data_spec, batch_size=B, max_length=T)
  driver = JaxDriver(env, data_policy,
                     observers=[lambda rs, frame: data_replay.add_batch(
                         rs, frame)])

  @jax.jit
  def collect(params, k):
    k_init, k_run = jax.random.split(k)
    dstate = driver.init(k_init)
    rs = data_replay.init()
    _, (rs,) = driver.run(params, dstate, (rs,), k_run, num_steps=T)
    return rs

  data_rstate = collect(behavior.policy_params(state.agent_state),
                        jax.random.key(11))
  assert int(jax.device_get(data_rstate.count)) == T

  data_dir = str(tmp_path / "dataset")
  observer = dataset_io.TrajectoryFileObserver(data_dir, data_spec,
                                               frames_per_shard=512)
  # gather_all: [B, capacity, ...] -> frames [T, B, ...] oldest-first.
  all_frames = jax.device_get(data_replay.gather_all(data_rstate))
  for t in range(T):
    observer(jax.tree_util.tree_map(lambda x: x[:, t], all_frames))
  observer.flush()

  # -- phase C: offline CQL from the file dataset --------------------------
  offline_replay = UniformReplay(data_spec, batch_size=B, max_length=T)
  template = jax.tree_util.tree_map(
      lambda s: np.zeros((1,) + tuple(s.shape), s.dtype), data_spec)
  rstate = dataset_io.dataset_to_replay(data_dir, template, offline_replay,
                                        offline_replay.init())
  assert int(jax.device_get(rstate.count)) == T

  # kumar20-style operating point, with conservatism scaled to Pendulum's
  # |Q| ~ 1500 (cql_alpha 10; mujoco_medium.gin uses 0.1 on normalized
  # MuJoCo rewards + softmax temperature 50 + a BC warm start).
  import math
  agent = CqlSacAgent(tss, asp, cql_alpha=10.0, num_cql_samples=8,
                      num_bc_steps=1000, softmax_temperature=50.0,
                      initial_log_alpha=math.log(0.1),
                      **_sac_kwargs(tss, asp))
  agent_state = agent.init(jax.random.key(1))

  @jax.jit
  def train_chunk(ag, key):
    def one(a, k):
      exp, _ = offline_replay.sample(rstate, k, 256,
                                     num_steps=agent.train_sequence_length)
      a, loss = agent.train(a, exp, key=k)
      return a, loss.loss
    ag, losses = jax.lax.scan(one, ag, jax.random.split(key, 100))
    return ag, losses[-1]

  key = jax.random.key(2)
  bc_return = None
  for i in range(30):  # 3k offline gradient steps (1k BC + 2k CQL)
    key, k = jax.random.split(key)
    agent_state, loss = train_chunk(agent_state, k)
    if i == 9:
      bc_return = greedy_eval(agent, agent.policy_params(agent_state))
  assert np.isfinite(float(jax.device_get(loss)))

  # After the BC warm start the policy must have recovered the dataset
  # policy (random play ~ -1500; dataset ~ behavior level). Smoke bar,
  # not a provenance band: -500 keeps a wide margin over random while
  # absorbing run-to-run endpoint noise — the round-5 address-ordered
  # replay gather permutes batch element order, which changes float
  # reduction order (same batch CONTENT), enough to move this
  # short-training endpoint a few percent (observed -427 -> -458).
  assert bc_return > -500, (bc_return, behavior_return)
  # The CQL phase must hold a conservative policy near the data, not
  # collapse to random (the pre-fix failure mode was ~ -1300).
  offline_return = greedy_eval(agent, agent.policy_params(agent_state))
  assert offline_return > -700, (offline_return, behavior_return)
