#!/bin/bash
# Round-8 follow-up queue: runs after r8_pipeline exits (gated on its
# pid file, which r8 writes at startup and removes on exit).
#
# Motivation: the 9000-iter fine-tune from the synthetic detector
# converged to the familiar single-pass ceiling (0.642 +mn vs t5's
# 0.639) — heavy augmentation over 9k iters washes out the init, the
# same pattern SSL showed. These probes preserve more of the
# pretrained detection capacity:
#   1. t7c — SHORT low-LR fine-tune (3000 iters, LR 1.5e-3, no
#      rotation so the variant set materializes in minutes).
#   2. t7 single-model TTA+vote+maskness (t1's config scored 0.687).
#   3. 4-model ensemble t7+t5+t1+p1 if the clock allows.
cd /root/repo
mkdir -p runs/logs

# wait for r8 (it removes /tmp/r8.pid on exit); bail after 5 h
WAITED=0
while [ -f /tmp/r8.pid ] && [ $WAITED -lt 18000 ]; do
  sleep 60; WAITED=$((WAITED + 60))
done
echo $$ > /tmp/r8b.pid
trap 'rm -f /tmp/r8b.pid' EXIT
set -x

END_TS=1787405400
have_minutes () {
  [ $(( $(date +%s) + $1 * 60 + 120 )) -lt $END_TS ]
}

AP=tools/ap_table.py
T1=runs/t1_crop/train/ckpt_9000
P1=runs/p1_cp/train/ckpt_9000
T5=runs/t5_fbn/train/ckpt_9000
T7PRE=runs/t7_synth/train
T7=runs/t7_ft/train
T7C=runs/t7c_short/train

commit_logs () {
  git add -f runs/logs/*.log 2>/dev/null
  git commit -q -m "$1" || true
}
commit_ckpt () {
  git add -f "$1/$2" "$1/config.json" "$1/metrics.json" 2>/dev/null
  git commit -q -m "$3" || true
}

# 1. t7c: short low-LR fine-tune preserving the synthetic detector
if [ -d $T7PRE/ckpt_20000 ] && [ ! -d $T7C/ckpt_3000 ] && have_minutes 30; then
  timeout 2400 python examples/powder_workflow.py --train \
    --weights $T7PRE/ckpt_20000 \
    --max-iter 3000 --lr 1.5e-3 --batch 2 --flip both --jitter 0.2 \
    --ema 0.999 --crop 704 --min-sizes 576,640,704 \
    --pseudo runs/pseudo2/particles.json \
    --edge-loss 0.5 --standardize on --cache-mb 3072 \
    --outdir runs/t7c_short > runs/logs/t7c_short.log 2>&1
  commit_ckpt $T7C ckpt_3000 "t7c: short low-LR fine-tune from the synthetic detector"
  for CK in ckpt_1800 ckpt_3000; do
    timeout 1200 python $AP --ckpt $T7C/$CK \
      --modes bf16 --maskness 1.0 >> runs/logs/eval_t7c.log 2>&1
  done
  commit_logs "t7c short fine-tune evals (init preservation vs the 9000-iter wash-out)"
fi

# 2. t7 single-model TTA + voting + maskness (t1's best single-model
#    config scored 0.687)
if [ -d $T7/ckpt_9000 ] && [ ! -s runs/logs/eval_t7_tta.log ] && have_minutes 18; then
  timeout 1500 python $AP --ckpt $T7/ckpt_9000 --modes bf16 --tta \
    --tta-scales 704,800,896 --vote 0.5 --maskness 1.0 --tta-only \
    > runs/logs/eval_t7_tta.log 2>&1
  commit_logs "t7 single-model TTA+vote+maskness (vs t1's 0.687)"
fi

# 3. 4-model ensemble t7+t5+t1+p1 (48 views)
if [ -d $T7/ckpt_9000 ] && [ ! -s runs/logs/eval_ens4_t7.log ] && have_minutes 45; then
  timeout 3600 python $AP --ckpt $T7/ckpt_9000 --modes bf16 --tta \
    --tta-scales 704,800,896 --vote 0.5 --maskness 1.0 --tta-only \
    --ensemble $T5,$T1,$P1 > runs/logs/eval_ens4_t7.log 2>&1
  commit_logs "4-model ensemble t7+t5+t1+p1 (TTA voting + maskness)"
fi

echo "r8b queue complete at $(date -u)"
