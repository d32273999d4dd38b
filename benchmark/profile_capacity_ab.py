import sys, time
sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/benchmark')
import jax, numpy as np
import importlib
pct = importlib.import_module("profile_conv_trace")

setups = {}
for rows, label in ((512, "65k"), (2048, "262k")):
    loop, state = pct.build(rows)
    full = pct.ablation_program(loop, "full")
    ng = pct.ablation_program(loop, "no_gather", jax.jit(
        lambda rs, k, lp=loop: lp.replay.sample(rs, k, lp.sample_batch_size,
            num_steps=lp.agent.train_sequence_length)[0]
    )(state.replay_state, jax.random.key(42)))
    # advance to bench-level fill (65k wraps; 262k reaches 1164)
    s, losses = full(state); float(np.asarray(losses)[-1]); del state
    for _ in range(10):
        s2, losses = full(s); float(np.asarray(losses)[-1]); del s; s = s2
    print(label, "fill:", int(np.asarray(s.replay_state.count)))
    setups[label] = (full, ng, s)

REPS = 8
times = {}
for r in range(REPS):
    for label, (full, ng, s) in setups.items():
        for nm, p in (("full", full), ("no_gather", ng)):
            t0 = time.time()
            out = p(s); float(np.asarray(out[1])[-1])
            times.setdefault((label, nm), []).append(
                (time.time()-t0)/pct.CHUNK*1e3)
            del out
for k, ts in sorted(times.items()):
    ts = sorted(ts); print(k, "med %.4f" % ts[len(ts)//2],
                           ["%.3f" % t for t in ts[:6]])
