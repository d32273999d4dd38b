#!/bin/bash
# Round-5 TPU queue, priority-ordered. Re-planned mid-round: /tmp was wiped
# between rounds, so the round-4 Humanoid checkpoint (1.9M steps) is gone and
# a from-scratch 5M run (~3.75 h at the measured 371 steps/s) exceeds the
# round's entire chip budget. Priority therefore goes to the two hard-promised
# Walker2d seeds, the conv trace, and the PPO table; Humanoid gets the tail of
# the budget as a live kill+resume demonstration of the checkpointing the
# round-4 verdict asked for (docs/humanoid_5m_wallclock.md has the math).
# Strictly serial (one JAX process on the axon relay). Each stage is
# timeout-bounded so a stall cannot eat the stages behind it; artifacts are
# copied only when complete (partial runs get a _partial suffix, never the
# promised name).
set -x
cd /root/repo

DEADLINE=${QUEUE_DEADLINE:-$(( $(date +%s) + 10000 ))}

last_step() {
  grep '"step"' "$1" 2>/dev/null | tail -1 | \
    python -c "import sys,json;print(json.loads(sys.stdin.read()).get('step',0))" 2>/dev/null || echo 0
}

# -- 1+2. Walker2d seeds 1-2 (hard-promised in the round-5 manifest) ---------
for s in 1 2; do
  timeout 2400 python examples/sac_halfcheetah.py \
    --cfg.root_dir=/tmp/agents_tpu/sac_walker2d_s$s \
    --cfg.env_name=Walker2d-v5 --cfg.total_env_steps=1000000 \
    --cfg.seed=$s --cfg.checkpoint_interval_ticks=8000 \
    > /tmp/walker_s$s.log 2>&1
  ws=$(last_step /tmp/agents_tpu/sac_walker2d_s$s/train.jsonl)
  if [ "$ws" -ge 990000 ]; then
    cp /tmp/agents_tpu/sac_walker2d_s$s/train.jsonl results/sac_walker2d_1m_s$s.jsonl
    cp /tmp/agents_tpu/sac_walker2d_s$s/config.json results/sac_walker2d_1m_s${s}_config.json
  else
    cp /tmp/agents_tpu/sac_walker2d_s$s/train.jsonl results/sac_walker2d_1m_s${s}_partial.jsonl 2>/dev/null
  fi
  echo STAGE_WALKER_S${s}_DONE step=$ws
done

# -- 3. Conv profile at two capacities (verdict #3) ---------------------------
timeout 1500 python benchmark/profile_conv_trace.py > /tmp/profile_conv.log 2>&1
echo STAGE_PROFILE_DONE rc=$?

# -- 4. PPO Hopper + Walker2d to 1M (verdict #5) -----------------------------
for env in Hopper Walker2d; do
  name=$(echo $env | tr 'A-Z' 'a-z')
  timeout 2400 python examples/ppo_halfcheetah.py \
    --cfg.root_dir=/tmp/agents_tpu/ppo_${name}_s0 \
    --cfg.env_name=${env}-v5 --cfg.seed=0 \
    > /tmp/ppo_${name}.log 2>&1
  ps=$(last_step /tmp/agents_tpu/ppo_${name}_s0/train.jsonl)
  if [ "$ps" -ge 990000 ]; then
    cp /tmp/agents_tpu/ppo_${name}_s0/train.jsonl results/ppo_${name}_1m_s0.jsonl
    cp /tmp/agents_tpu/ppo_${name}_s0/config.json results/ppo_${name}_1m_s0_config.json
  else
    cp /tmp/agents_tpu/ppo_${name}_s0/train.jsonl results/ppo_${name}_1m_s0_partial.jsonl 2>/dev/null
  fi
  echo STAGE_PPO_${name}_DONE step=$ps
done

# -- 5. TPU verify drive (short; must land regardless of later cuts) ---------
timeout 600 python benchmark/drive_r5.py > /tmp/drive_r5.log 2>&1
echo STAGE_DRIVE_DONE rc=$?

# -- 6. Humanoid: live kill+resume demo with whatever budget remains ---------
# Two chunks: the first is timeout-killed mid-run (simulating preemption),
# the second resumes from the periodic orbax checkpoint and continues the
# same train.jsonl. The artifact proves the flagship binary's
# checkpoint/resume works in anger on real TPU (round-4 Missing #1 /
# Weak #5); docs/humanoid_5m_wallclock.md documents why 5M itself cannot
# fit this round.
rem=$(( DEADLINE - $(date +%s) ))
if [ "$rem" -gt 900 ]; then
  c1=$(( (rem - 300) / 2 )); [ "$c1" -gt 2400 ] && c1=2400
  timeout $c1 python examples/sac_halfcheetah.py \
    --cfg.root_dir=/tmp/agents_tpu/sac_humanoid_resume \
    --cfg.env_name=Humanoid-v5 --cfg.total_env_steps=5000000 \
    --cfg.initial_collect_ticks=32 --cfg.train_steps_per_call=32 \
    --cfg.utd_ratio=1.0 --cfg.eval_every_ticks=2000 \
    --cfg.checkpoint_interval_ticks=4000 --cfg.seed=0 \
    >> /tmp/humanoid_resume.log 2>&1
  echo HUMANOID_CHUNK1_KILLED step=$(last_step /tmp/agents_tpu/sac_humanoid_resume/train.jsonl)
  rem=$(( DEADLINE - $(date +%s) ))
  c2=$(( rem - 120 ))
  if [ "$c2" -gt 300 ]; then
    timeout $c2 python examples/sac_halfcheetah.py \
      --cfg.root_dir=/tmp/agents_tpu/sac_humanoid_resume \
      --cfg.env_name=Humanoid-v5 --cfg.total_env_steps=5000000 \
      --cfg.initial_collect_ticks=32 --cfg.train_steps_per_call=32 \
      --cfg.utd_ratio=1.0 --cfg.eval_every_ticks=2000 \
      --cfg.checkpoint_interval_ticks=4000 --cfg.seed=0 \
      >> /tmp/humanoid_resume.log 2>&1
  fi
  hs=$(last_step /tmp/agents_tpu/sac_humanoid_resume/train.jsonl)
  cp /tmp/agents_tpu/sac_humanoid_resume/train.jsonl \
     results/sac_humanoid_resumed_partial_s0.jsonl 2>/dev/null
  cp /tmp/agents_tpu/sac_humanoid_resume/config.json \
     results/sac_humanoid_resumed_partial_s0_config.json 2>/dev/null
  echo STAGE_HUMANOID_RESUME_DONE step=$hs
fi
echo QUEUE_DONE
