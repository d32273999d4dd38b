import sys, time
sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/benchmark')
import jax, numpy as np
import importlib
pct = importlib.import_module("profile_conv_trace")

from agents_tpu import metrics as metrics_lib
from agents_tpu.replay_buffers import UniformReplay
from agents_tpu.train import FusedTrainLoop

loopA, state = pct.build(2048)           # sorted gather (default)
replayB = UniformReplay(loopA.replay.data_spec, batch_size=loopA.replay.batch_size,
                        max_length=loopA.replay.capacity, sort_for_locality=False)
loopB = FusedTrainLoop(loopA.env, loopA.agent, replayB,
                       metrics=metrics_lib.standard_collect_metrics(20),
                       collect_steps_per_iteration=1,
                       sample_batch_size=loopA.sample_batch_size)

fullA = pct.ablation_program(loopA, "full")
fullB = pct.ablation_program(loopB, "full")
ng = pct.ablation_program(loopA, "no_gather", jax.jit(
    lambda rs, k: loopA.replay.sample(rs, k, loopA.sample_batch_size,
        num_steps=loopA.agent.train_sequence_length)[0]
)(state.replay_state, jax.random.key(42)))

# Advance ring to bench-level fill.
s, losses = fullA(state); float(np.asarray(losses)[-1]); del state
for _ in range(10):
    s2, losses = fullA(s); float(np.asarray(losses)[-1]); del s; s = s2
print("fill:", int(np.asarray(s.replay_state.count)))

progs = {"sorted": fullA, "unsorted": fullB, "no_gather": ng}
# Warm each (compile + program load), with readback sync.
for name, p in progs.items():
    out = p(s); float(np.asarray(out[1])[-1]); del out

REPS = 8
times = {k: [] for k in progs}
for r in range(REPS):
    for name, p in progs.items():   # interleaved: drift hits all equally
        t0 = time.time()
        out = p(s); float(np.asarray(out[1])[-1])
        times[name].append((time.time() - t0) / pct.CHUNK * 1e3)
        del out
for name, ts in times.items():
    ts = sorted(ts)
    med = ts[len(ts)//2]
    print("%-10s med %.4f ms/iter  all %s" % (name, med,
          ["%.3f" % t for t in ts]))
