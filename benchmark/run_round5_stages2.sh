#!/bin/bash
# Round-5 TPU stages, part 2 (after the queue wrapper was retired so the
# Walker2d s1 resume could be inserted). Strictly serial on the chip.
set -x
cd /root/repo

last_step() {
  grep '"step"' "$1" 2>/dev/null | tail -1 | \
    python -c "import sys,json;print(json.loads(sys.stdin.read()).get('step',0))" 2>/dev/null || echo 0
}

# -- 0. Wait for the running Walker2d s2 process, then copy its artifact -----
while kill -0 4209 2>/dev/null; do sleep 10; done
ws=$(last_step /tmp/agents_tpu/sac_walker2d_s2/train.jsonl)
if [ "$ws" -ge 990000 ]; then
  cp /tmp/agents_tpu/sac_walker2d_s2/train.jsonl results/sac_walker2d_1m_s2.jsonl
  cp /tmp/agents_tpu/sac_walker2d_s2/config.json results/sac_walker2d_1m_s2_config.json
else
  cp /tmp/agents_tpu/sac_walker2d_s2/train.jsonl results/sac_walker2d_1m_s2_partial.jsonl 2>/dev/null
fi
echo STAGE_WALKER_S2_DONE step=$ws

# -- 1. Walker2d s1: resume from the tick-24000 checkpoint to 1M ------------
timeout 1100 python examples/sac_halfcheetah.py \
  --cfg.root_dir=/tmp/agents_tpu/sac_walker2d_s1 \
  --cfg.env_name=Walker2d-v5 --cfg.total_env_steps=1000000 \
  --cfg.seed=1 --cfg.checkpoint_interval_ticks=8000 \
  >> /tmp/walker_s1.log 2>&1
ws=$(last_step /tmp/agents_tpu/sac_walker2d_s1/train.jsonl)
if [ "$ws" -ge 990000 ]; then
  cp /tmp/agents_tpu/sac_walker2d_s1/train.jsonl results/sac_walker2d_1m_s1.jsonl
  cp /tmp/agents_tpu/sac_walker2d_s1/config.json results/sac_walker2d_1m_s1_config.json
  rm -f results/sac_walker2d_1m_s1_partial.jsonl
else
  cp /tmp/agents_tpu/sac_walker2d_s1/train.jsonl results/sac_walker2d_1m_s1_partial.jsonl 2>/dev/null
fi
echo STAGE_WALKER_S1_RESUME_DONE step=$ws

# -- 2. Humanoid kill+resume demo (the amended round-5 manifest promise) -----
# Progress records (250 ticks = 8k steps) denser than checkpoints (2000
# ticks = 64k steps): the resume restores the last checkpoint, so the
# records chunk 1 wrote past it make the backward step jump visible in
# the artifact (the continuity test's witness of a real resume).
HARGS="--cfg.root_dir=/tmp/agents_tpu/sac_humanoid_resume \
  --cfg.env_name=Humanoid-v5 --cfg.total_env_steps=5000000 \
  --cfg.initial_collect_ticks=32 --cfg.train_steps_per_call=32 \
  --cfg.utd_ratio=1.0 --cfg.eval_every_ticks=0 \
  --cfg.replay_capacity=8192 --cfg.progress_every_ticks=250 \
  --cfg.checkpoint_interval_ticks=2000 --cfg.seed=0"
timeout 450 python examples/sac_halfcheetah.py $HARGS \
  >> /tmp/humanoid_resume.log 2>&1
echo HUMANOID_CHUNK1_KILLED step=$(last_step /tmp/agents_tpu/sac_humanoid_resume/train.jsonl)
timeout 450 python examples/sac_halfcheetah.py $HARGS \
  >> /tmp/humanoid_resume.log 2>&1
hs=$(last_step /tmp/agents_tpu/sac_humanoid_resume/train.jsonl)
cp /tmp/agents_tpu/sac_humanoid_resume/train.jsonl \
   results/sac_humanoid_resumed_partial_s0.jsonl 2>/dev/null
cp /tmp/agents_tpu/sac_humanoid_resume/config.json \
   results/sac_humanoid_resumed_partial_s0_config.json 2>/dev/null
echo STAGE_HUMANOID_RESUME_DONE step=$hs

# -- 3. Conv profile at two capacities (verdict #3) ---------------------------
timeout 1400 python benchmark/profile_conv_trace.py > /tmp/profile_conv.log 2>&1
echo STAGE_PROFILE_DONE rc=$?

# -- 4. TPU verify drive ------------------------------------------------------
timeout 500 python benchmark/drive_r5.py > /tmp/drive_r5.log 2>&1
echo STAGE_DRIVE_DONE rc=$?
echo QUEUE2_DONE
