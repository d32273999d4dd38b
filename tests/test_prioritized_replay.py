"""PrioritizedReplay: sampling proportionality, priority updates,
staleness, wraparound validity, IS weights, and end-to-end use as the
weights= source for a DQN train step (the reference's prioritized path is
dm-reverb's Prioritized selector + reverb_replay_buffer.update_priorities
:436)."""
import jax
import jax.numpy as jnp
import numpy as np

from agents_tpu.replay_buffers import PrioritizedReplay
from agents_tpu.specs import array_spec


def _spec():
  return {"x": array_spec.ArraySpec((2,), np.float32)}


def _frame(v, b):
  return {"x": jnp.full((b, 2), float(v), jnp.float32)}


def test_sampling_proportional_to_priority():
  rb = PrioritizedReplay(_spec(), batch_size=1, max_length=8, alpha=1.0)
  st = rb.init()
  # 4 items with priorities 1, 1, 1, 5 (update after insert).
  for i in range(4):
    st = rb.add_batch(st, _frame(i, 1), priorities=jnp.ones((1,)))
  from agents_tpu.replay_buffers import PrioritizedBufferInfo
  info = PrioritizedBufferInfo(
      ids=jnp.asarray([3]), rows=jnp.asarray([0]),
      probabilities=jnp.ones((1,)), is_weights=jnp.ones((1,)))
  st = rb.update_priorities(st, info, jnp.asarray([5.0]))

  batch, binfo = jax.jit(
      lambda s, k: rb.sample(s, k, 4096))(st, jax.random.key(0))
  frac_3 = float((binfo.ids == 3).mean())
  # p = (1,1,1,5+eps)/8 -> item 3 should be ~5/8 = 0.625 of samples.
  assert abs(frac_3 - 5.0 / 8.0) < 0.03
  # Sampled values match their ids (storage gather consistent).
  vals = np.asarray(batch["x"][:, 0])
  np.testing.assert_allclose(vals, np.asarray(binfo.ids, np.float32))


def test_new_items_get_max_priority():
  rb = PrioritizedReplay(_spec(), batch_size=1, max_length=8)
  st = rb.init()
  st = rb.add_batch(st, _frame(0, 1), priorities=jnp.asarray([10.0]))
  st = rb.add_batch(st, _frame(1, 1))  # default: running max
  assert float(st.priorities[1, 0]) >= 10.0


def test_stale_update_dropped():
  rb = PrioritizedReplay(_spec(), batch_size=1, max_length=4, alpha=1.0)
  st = rb.init()
  for i in range(8):  # ids 0..7; ids 0-3 overwritten
    st = rb.add_batch(st, _frame(i, 1), priorities=jnp.ones((1,)))
  from agents_tpu.replay_buffers import PrioritizedBufferInfo
  stale = PrioritizedBufferInfo(
      ids=jnp.asarray([1]), rows=jnp.asarray([0]),
      probabilities=jnp.ones((1,)), is_weights=jnp.ones((1,)))
  st2 = rb.update_priorities(st, stale, jnp.asarray([100.0]))
  np.testing.assert_allclose(np.asarray(st2.priorities),
                             np.asarray(st.priorities))
  # A live id at the same ring position IS updated.
  live = stale._replace(ids=jnp.asarray([5]))  # 5 % 4 == 1
  st3 = rb.update_priorities(st, live, jnp.asarray([100.0]))
  assert float(st3.priorities[1, 0]) > 99.0


def test_duplicate_updates_max_combine():
  rb = PrioritizedReplay(_spec(), batch_size=1, max_length=4, alpha=1.0,
                         epsilon=0.0)
  st = rb.init()
  for i in range(4):
    st = rb.add_batch(st, _frame(i, 1), priorities=jnp.ones((1,)))
  from agents_tpu.replay_buffers import PrioritizedBufferInfo
  info = PrioritizedBufferInfo(
      ids=jnp.asarray([2, 2]), rows=jnp.asarray([0, 0]),
      probabilities=jnp.ones((2,)), is_weights=jnp.ones((2,)))
  st = rb.update_priorities(st, info, jnp.asarray([0.5, 3.0]))
  assert abs(float(st.priorities[2, 0]) - 3.0) < 1e-6


def test_window_validity_and_wraparound():
  rb = PrioritizedReplay(_spec(), batch_size=2, max_length=4, alpha=0.0)
  st = rb.init()
  for i in range(6):  # count=6, size=4: valid ids 2..5
    st = rb.add_batch(st, _frame(i, 2))
  batch, info = jax.jit(
      lambda s, k: rb.sample(s, k, 512, num_steps=2))(st, jax.random.key(1))
  ids = np.asarray(info.ids)
  # Window starts must lie in [2, 4] (start 5 has no successor).
  assert ids.min() >= 2 and ids.max() <= 4
  # Window contiguity: second frame value = first + 1.
  v = np.asarray(batch["x"])  # [S, 2, 2]
  np.testing.assert_allclose(v[:, 1, 0], v[:, 0, 0] + 1.0)


def test_uniform_priorities_give_unit_is_weights():
  rb = PrioritizedReplay(_spec(), batch_size=2, max_length=8, alpha=1.0)
  st = rb.init()
  for i in range(8):
    st = rb.add_batch(st, _frame(i, 2), priorities=jnp.ones((2,)))
  _, info = rb.sample(st, jax.random.key(0), 64, beta=1.0)
  np.testing.assert_allclose(np.asarray(info.is_weights),
                             np.ones(64), rtol=1e-5)


def test_per_dqn_train_step_end_to_end():
  """PER sample -> DQN train with IS weights -> update_priorities with
  TD errors, all inside one jitted step; loss finite, priorities move."""
  import optax

  from agents_tpu import networks
  from agents_tpu.agents.dqn import DqnAgent
  from agents_tpu.environments.classic.cartpole import CartPole
  from agents_tpu.environments.jax_environment import BatchedJaxEnv
  from agents_tpu.trajectories import policy_step as _ps
  from agents_tpu.trajectories import trajectory as tj
  from agents_tpu.utils import common

  B = 8
  env = BatchedJaxEnv(CartPole(), batch_size=B)
  tss, asp = env.time_step_spec(), env.action_spec()
  qnet = networks.make_q_network(tss.observation, asp,
                                 fc_layer_params=(32,))
  agent = DqnAgent(tss, asp, qnet, optax.adam(1e-3), epsilon_greedy=0.1,
                   target_update_tau=0.05, target_update_period=5,
                   gamma=0.99,
                   td_errors_loss_fn=common.element_wise_squared_loss)
  rb = PrioritizedReplay(tj.trajectory_spec(tss, asp), batch_size=B,
                         max_length=64)

  @jax.jit
  def fill_and_train(key):
    k_env, k_pol, k_s = jax.random.split(key, 3)
    agent_state = agent.init(k_pol)
    env_state, step = env.reset(k_env)
    rb_state = rb.init()

    def collect(carry, k):
      env_state, step, rb_state = carry
      action = jax.random.randint(k, (B,), 0, 2)
      new_env_state, new_step = env.step(env_state, step, action, k)
      traj = tj.from_transition(step, _ps.PolicyStep(action=action),
                                new_step)
      rb_state = rb.add_batch(rb_state, traj)
      return (new_env_state, new_step, rb_state), ()

    (_, _, rb_state), _ = jax.lax.scan(
        collect, (env_state, step, rb_state), jax.random.split(k_env, 32))

    exp, info = rb.sample(rb_state, k_s, 16, num_steps=2)
    agent_state, loss = agent.train(agent_state, exp,
                                    weights=info.is_weights)
    rb_state = rb.update_priorities(rb_state, info, loss.extra.td_error)
    return loss.loss, rb_state, info

  loss, rb_state, info = fill_and_train(jax.random.key(0))
  assert np.isfinite(float(loss))
  pr = np.asarray(rb_state.priorities)
  assert pr.std() > 0.0  # TD errors differentiated the priorities


def test_fused_loop_with_prioritized_replay_learns():
  """FusedTrainLoop auto-detects PER: IS weights in, TD errors back.
  CartPole average return must beat random play within a short budget."""
  import optax

  from agents_tpu import metrics, networks
  from agents_tpu.agents.dqn import DqnAgent
  from agents_tpu.environments.classic.cartpole import CartPole
  from agents_tpu.environments.jax_environment import BatchedJaxEnv
  from agents_tpu.train import FusedTrainLoop
  from agents_tpu.trajectories import trajectory as tj
  from agents_tpu.utils import common

  B = 32
  env = BatchedJaxEnv(CartPole(), batch_size=B)
  tss, asp = env.time_step_spec(), env.action_spec()
  qnet = networks.make_q_network(tss.observation, asp,
                                 fc_layer_params=(64, 64))
  agent = DqnAgent(tss, asp, qnet, optax.adam(1e-3), epsilon_greedy=0.1,
                   target_update_tau=0.05, target_update_period=5,
                   gamma=0.99,
                   td_errors_loss_fn=common.element_wise_squared_loss)
  rb = PrioritizedReplay(tj.trajectory_spec(tss, asp), batch_size=B,
                         max_length=256)
  loop = FusedTrainLoop(env, agent, rb,
                        metrics=metrics.standard_collect_metrics(20),
                        collect_steps_per_iteration=1,
                        sample_batch_size=64)
  state = jax.jit(lambda k: loop.init(k, initial_collect_steps=64))(
      jax.random.key(0))
  run = jax.jit(lambda s: loop.run(s, 800))
  state, losses = run(state)
  assert np.isfinite(np.asarray(losses)).all()
  state, losses = run(state)  # 1600 total: PER hits ~200 here (uniform ~140)
  assert np.isfinite(np.asarray(losses)).all()
  res = loop.results(state)
  avg = float(res["AverageReturn"])
  assert avg > 100.0, f"PER loop failed to learn: return {avg}"
  # Priorities actually differentiated during training.
  assert float(np.asarray(state.replay_state.priorities).std()) > 0.0


def test_sample_sharded_prioritized_semantics():
  """Shard-local PER: payload integrity, per-shard stratification, and
  IS weights matching hand-computed global normalization."""
  from jax.sharding import NamedSharding, PartitionSpec as P

  from agents_tpu import specs
  from agents_tpu.parallel import create_mesh

  B, CAP, S = 8, 16, 256
  spec = {"tag": specs.ArraySpec((), np.int32)}
  rb = PrioritizedReplay(spec, batch_size=B, max_length=CAP, alpha=1.0)
  state = rb.init()
  for t in range(10):
    # priority r+1 per row: shard masses differ, weights must still be
    # globally normalized.
    state = rb.add_batch(
        state, {"tag": jnp.arange(B, dtype=jnp.int32) * 100 + t},
        priorities=jnp.arange(1.0, B + 1.0))

  mesh = create_mesh(4)
  place = lambda x: jax.device_put(x, NamedSharding(mesh, P(None, "data")))
  state = state.replace(storage=jax.tree_util.tree_map(place, state.storage),
                        priorities=place(state.priorities))

  batch, info = jax.jit(
      lambda s, k: rb.sample_sharded(s, k, S, mesh, beta=0.5))(
          state, jax.random.key(0))
  rows, ids = np.asarray(info.rows), np.asarray(info.ids)
  tags = np.asarray(batch["tag"])

  np.testing.assert_array_equal(tags, rows * 100 + ids)
  # Stratified: exactly S/4 samples from each shard's 2-row block.
  for shard in range(4):
    assert ((rows // 2) == shard).sum() == S // 4
  # Within a shard, higher-priority rows are sampled more often.
  odd = (rows % 2 == 1).sum()
  assert odd > S // 2  # row 2k+1 has higher priority than row 2k

  # IS weights: w = (N_g * p_g)^-beta / max over the whole batch.
  probs = np.asarray(info.probabilities)
  n_g = 10 * B  # valid windows x rows, globally
  w_expected = (n_g * probs) ** -0.5
  w_expected = w_expected / w_expected.max()
  np.testing.assert_allclose(np.asarray(info.is_weights), w_expected,
                             rtol=1e-5)

  # Priorities written back through global rows land on the right slots.
  state2 = jax.jit(rb.update_priorities)(state, info,
                                         jnp.ones((S,)) * 0.123)
  pr = np.asarray(state2.priorities)
  touched = set(zip((ids % CAP).tolist(), rows.tolist()))
  for (p, r) in touched:
    np.testing.assert_allclose(pr[p, r], 0.123 + rb.epsilon, rtol=1e-5)
