import sys, time
sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/benchmark')
import jax, numpy as np
import importlib
pct = importlib.import_module("profile_conv_trace")

loop, state = pct.build(2048)   # 262k-frame ring
full_fn = pct.ablation_program(loop, "full")
ng_fn = pct.ablation_program(loop, "no_gather", jax.jit(
    lambda rs, k: loop.replay.sample(rs, k, loop.sample_batch_size,
        num_steps=loop.agent.train_sequence_length)[0]
)(state.replay_state, jax.random.key(42)))

print("fill(before): count=", int(np.asarray(state.replay_state.count)))
e_full = pct.timed(full_fn, state)
e_ng = pct.timed(ng_fn, state)
print("near-empty: full=%.4f no_gather=%.4f gather=%.4f" %
      (e_full, e_ng, e_full - e_ng))

# Advance the ring to bench-like fill (~1.2k of 2048 slots).
s, losses = full_fn(state)
float(np.asarray(losses)[-1]); del state
for _ in range(10):
    s2, losses = full_fn(s)
    float(np.asarray(losses)[-1])
    del s
    s = s2
print("fill(after): count=", int(np.asarray(s.replay_state.count)))
f_full = pct.timed(full_fn, s)
f_ng = pct.timed(ng_fn, s)
print("filled:     full=%.4f no_gather=%.4f gather=%.4f" %
      (f_full, f_ng, f_full - f_ng))
