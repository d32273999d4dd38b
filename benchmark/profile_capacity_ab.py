import sys, time
sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/benchmark')
import jax, numpy as np
import importlib
pct = importlib.import_module("profile_conv_trace")

setups = {}
for rows, label in ((512, "65k"), (1024, "131k")):
    loop, state = pct.build(rows)
    progs = {
        "full": pct.ablation_program(loop, "full"),
        "no_train": pct.ablation_program(loop, "no_train"),
        "train_only": pct.ablation_program(loop, "train_only"),
    }
    s, losses = progs["full"](state); float(np.asarray(losses)[-1]); del state
    for _ in range(10):
        s2, losses = progs["full"](s); float(np.asarray(losses)[-1]); del s; s = s2
    print(label, "fill:", int(np.asarray(s.replay_state.count)), flush=True)
    setups[label] = (progs, s)

times = {}
# warm all
for label, (progs, s) in setups.items():
    for nm, p in progs.items():
        out = p(s); float(np.asarray(out[1])[-1]); del out
for r in range(8):
    for label, (progs, s) in setups.items():
        for nm, p in progs.items():
            t0 = time.time()
            out = p(s); float(np.asarray(out[1])[-1])
            times.setdefault((label, nm), []).append(
                (time.time()-t0)/pct.CHUNK*1e3)
            del out
for k, ts in sorted(times.items()):
    ts = sorted(ts); print(k, "med %.4f" % ts[len(ts)//2])
