#!/bin/bash
# Round-5 TPU queue: runs after the Humanoid 5M run frees the chip.
# Strictly serial (one JAX process at a time on the axon relay).
set -x
cd /root/repo

finish_humanoid() {
  # Resume the 5M run if the timeout cut it short (checkpoint/resume is
  # the round-5 capability — finishing in a second chunk exercises it).
  last=$(grep '"step"' /tmp/agents_tpu/sac_humanoid_5m_s0/train.jsonl | tail -1 | python -c "import sys,json;print(json.loads(sys.stdin.read())['step'])")
  if [ "$last" -lt 4990000 ]; then
    timeout 7200 python examples/sac_halfcheetah.py \
      --cfg.root_dir=/tmp/agents_tpu/sac_humanoid_5m_s0 \
      --cfg.env_name=Humanoid-v5 --cfg.total_env_steps=5000000 \
      --cfg.initial_collect_ticks=32 --cfg.train_steps_per_call=32 \
      --cfg.utd_ratio=1.0 --cfg.eval_every_ticks=4000 \
      --cfg.checkpoint_interval_ticks=8000 --cfg.seed=0 \
      >> /tmp/humanoid5m.log 2>&1
  fi
  cp /tmp/agents_tpu/sac_humanoid_5m_s0/train.jsonl results/sac_humanoid_5m_s0.jsonl
  cp /tmp/agents_tpu/sac_humanoid_5m_s0/config.json results/sac_humanoid_5m_s0_config.json
}

walker_seed() {
  s=$1
  timeout 4200 python examples/sac_halfcheetah.py \
    --cfg.root_dir=/tmp/agents_tpu/sac_walker2d_s$s \
    --cfg.env_name=Walker2d-v5 --cfg.total_env_steps=1000000 \
    --cfg.seed=$s --cfg.checkpoint_interval_ticks=8000 \
    > /tmp/walker_s$s.log 2>&1
  cp /tmp/agents_tpu/sac_walker2d_s$s/train.jsonl results/sac_walker2d_1m_s$s.jsonl
  cp /tmp/agents_tpu/sac_walker2d_s$s/config.json results/sac_walker2d_1m_s${s}_config.json
}

ppo_run() {
  env=$1; name=$2
  timeout 3600 python examples/ppo_halfcheetah.py \
    --cfg.root_dir=/tmp/agents_tpu/ppo_${name}_s0 \
    --cfg.env_name=$env --cfg.seed=0 \
    > /tmp/ppo_${name}.log 2>&1
  cp /tmp/agents_tpu/ppo_${name}_s0/train.jsonl results/ppo_${name}_1m_s0.jsonl
  cp /tmp/agents_tpu/ppo_${name}_s0/config.json results/ppo_${name}_1m_s0_config.json
}

finish_humanoid
walker_seed 1
walker_seed 2
timeout 2400 python benchmark/profile_conv_trace.py > /tmp/profile_conv.log 2>&1
ppo_run Hopper-v5 hopper
ppo_run Walker2d-v5 walker2d
echo QUEUE_DONE
