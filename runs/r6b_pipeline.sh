#!/bin/bash
# Round-6 tail queue (runs after r6_pipeline.sh): satellite
# resolution-regime levers (VERDICT r5 #2) + compile-cache artifact
# (#5). Gated on artifacts, re-runnable.
cd /root/repo
mkdir -p runs/logs
set -x

AP=tools/ap_table.py
SB=runs/t2_sat/train_satellites/ckpt_5400
SSL=runs/ssl_bb/ckpt_16000
T6=runs/t6_sat/train_satellites/ckpt_9000

commit_logs () {
  git add -f runs/logs/*.log 2>/dev/null
  git commit -m "$1" || true
}
commit_ckpt () {
  git add -f "$1/$2" "$1/config.json" "$1/metrics.json" 2>/dev/null
  git commit -m "$3" || true
}

# 1. tiled-crop inference on the existing best satellite checkpoint:
#    512-px tiles = the exact training field of view (--sat-native
#    trains on 448-512 crops; whole-frame inference was the mismatch)
if [ -d $SB ] && [ ! -s runs/logs/eval_sat_tiled.log ]; then
  timeout 3000 python $AP --ckpt $SB --dataset powder_satellite \
    --modes bf16 --tiled 512 --tile-overlap 128 \
    > runs/logs/eval_sat_tiled.log 2>&1
  timeout 2400 python $AP --ckpt $SB --dataset powder_satellite \
    --modes bf16 --tiled 512 --tile-overlap 128 --maskness 1.0 \
    > runs/logs/eval_sat_tiled_mn.log 2>&1
  timeout 2400 python $AP --ckpt $SB --dataset powder_satellite \
    --modes bf16 --tiled 512 --tile-overlap 128 --vote 0.5 \
    --maskness 1.0 > runs/logs/eval_sat_tiled_vote.log 2>&1
  commit_logs "Satellite tiled-crop inference (512 native tiles): plain/maskness/vote rows"
fi

# 2. satellite retrain with the SSL backbone (same tiny-object recipe
#    as t2_sat; single change = pretrained init)
if [ -d $SSL ] && [ ! -d $T6 ]; then
  timeout 10800 python examples/powder_workflow.py \
    --train-satellites --sat-native --max-iter 9000 \
    --lr 4e-3 --batch 2 --flip both --jitter 0.2 --ema 0.999 \
    --init-backbone $SSL \
    --outdir runs/t6_sat > runs/logs/t6_sat.log 2>&1
  commit_ckpt runs/t6_sat/train_satellites ckpt_5400 \
    "t6: satellite tiny-object recipe + SSL backbone (ckpt_5400)"
  commit_ckpt runs/t6_sat/train_satellites ckpt_9000 \
    "t6: satellite tiny-object recipe + SSL backbone (final)"
fi
if [ -d $T6 ] && [ ! -s runs/logs/eval_t6_sat.log ]; then
  for CK in ckpt_5400 ckpt_9000; do
    timeout 2400 python $AP --ckpt runs/t6_sat/train_satellites/$CK \
      --dataset powder_satellite --modes bf16 --maskness 1.0 \
      >> runs/logs/eval_t6_sat.log 2>&1
    timeout 2400 python $AP --ckpt runs/t6_sat/train_satellites/$CK \
      --dataset powder_satellite --modes bf16 --tiled 512 \
      --tile-overlap 128 --maskness 1.0 \
      >> runs/logs/eval_t6_sat_tiled.log 2>&1
  done
  commit_logs "SSL-backbone satellite model: whole-frame + tiled rows"
fi

# 3. compile-cache artifact for the flagship bench config (VERDICT #5)
if ! ls artifacts/compile_cache/*.tar.gz >/dev/null 2>&1; then
  timeout 3600 python tools/prime_compile_cache.py \
    > runs/logs/prime_cache.log 2>&1
  if ls artifacts/compile_cache/*.tar.gz >/dev/null 2>&1; then
    git add -f artifacts/compile_cache/*.tar.gz runs/logs/prime_cache.log
    git commit -m "Shipped compile-cache artifact: flagship bench config (cold start -> seconds)" || true
  fi
fi
echo R6B_PIPELINE_DONE
