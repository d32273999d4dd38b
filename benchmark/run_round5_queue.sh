#!/bin/bash
# Round-5 TPU queue, priority-ordered per the round-4 verdict:
# 1) finish Humanoid 5M (resume from checkpoint), 2) conv profile at two
# capacities, 3) Walker2d seeds 1-2. Strictly serial (one JAX process on
# the axon relay). Each stage is timeout-bounded so a stall cannot eat
# the stages behind it; artifacts are copied only when complete (partial
# runs get a _partial suffix, never the promised name).
set -x
cd /root/repo

last_step() {
  grep '"step"' "$1" 2>/dev/null | tail -1 | \
    python -c "import sys,json;print(json.loads(sys.stdin.read()).get('step',0))" 2>/dev/null || echo 0
}

# -- 1. Humanoid: resume to 5M ------------------------------------------------
hs=$(last_step /tmp/agents_tpu/sac_humanoid_5m_s0/train.jsonl)
if [ "$hs" -lt 4990000 ]; then
  timeout 6600 python examples/sac_halfcheetah.py \
    --cfg.root_dir=/tmp/agents_tpu/sac_humanoid_5m_s0 \
    --cfg.env_name=Humanoid-v5 --cfg.total_env_steps=5000000 \
    --cfg.initial_collect_ticks=32 --cfg.train_steps_per_call=32 \
    --cfg.utd_ratio=1.0 --cfg.eval_every_ticks=4000 \
    --cfg.checkpoint_interval_ticks=8000 --cfg.seed=0 \
    >> /tmp/humanoid5m.log 2>&1
fi
hs=$(last_step /tmp/agents_tpu/sac_humanoid_5m_s0/train.jsonl)
if [ "$hs" -ge 4990000 ]; then
  cp /tmp/agents_tpu/sac_humanoid_5m_s0/train.jsonl results/sac_humanoid_5m_s0.jsonl
  cp /tmp/agents_tpu/sac_humanoid_5m_s0/config.json results/sac_humanoid_5m_s0_config.json
else
  cp /tmp/agents_tpu/sac_humanoid_5m_s0/train.jsonl results/sac_humanoid_5m_s0_partial.jsonl
fi
echo STAGE_HUMANOID_DONE step=$hs

# -- 2. Conv profile (verdict #3) --------------------------------------------
timeout 1800 python benchmark/profile_conv_trace.py > /tmp/profile_conv.log 2>&1
echo STAGE_PROFILE_DONE rc=$?

# -- 3. Walker2d seeds 1-2 (verdict #4) --------------------------------------
for s in 1 2; do
  timeout 2700 python examples/sac_halfcheetah.py \
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

# -- 4. TPU verify drive (short; must land regardless of later cuts) --------
timeout 1200 python /tmp/drive_r5.py > /tmp/drive_r5.log 2>&1
echo STAGE_DRIVE_DONE rc=$?

# -- 5. PPO Hopper + Walker2d to 1M (verdict #5) -----------------------------
for env in Hopper Walker2d; do
  name=$(echo $env | tr 'A-Z' 'a-z')
  timeout 3000 python examples/ppo_halfcheetah.py \
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

# -- 6. Reference SAC best-case throughput (idle host, default threads) ------
REF_SAC_SINGLE_THREAD=0 REF_SAC_EVAL_INTERVAL=999999999 \
  timeout 900 nice -n 0 python benchmark/ref_sac_baseline.py \
  Walker2d-v5 6000 /tmp/ref_sac_throughput.jsonl \
  > /tmp/ref_sac_throughput.log 2>&1
echo STAGE_REF_THROUGHPUT_DONE

# -- 7. CQL mixed pipeline on Hopper (verdict #8 stretch; cuttable tail) -----
timeout 2400 python examples/cql_sac_offline.py \
  --cfg.root_dir=/tmp/agents_tpu/cql_hopper_mixed \
  --cfg.env_name=Hopper-v5 --cfg.dataset_mix=mixed \
  --cfg.behavior_env_steps=72000 --cfg.dataset_frames=200000 \
  --cfg.mixed_random_fraction=0.2 --cfg.offline_train_steps=500000 \
  --cfg.cql_alpha=0.1 --cfg.softmax_temperature=50.0 \
  --cfg.num_bc_steps=10000 --cfg.train_steps_per_call=64 \
  > /tmp/cql_hopper.log 2>&1
if [ -f /tmp/agents_tpu/cql_hopper_mixed/offline.jsonl ]; then
  cp /tmp/agents_tpu/cql_hopper_mixed/offline.jsonl results/cql_sac_offline_hopper_mixed.jsonl
  cp /tmp/agents_tpu/cql_hopper_mixed/config.json results/cql_sac_offline_hopper_mixed_config.json
fi
echo STAGE_CQL_HOPPER_DONE rc=$?
echo QUEUE_DONE
