#!/bin/bash
# Round-6 final queue. With t5 (FrozenBN+SSL, 0.639 mn) banked, the
# short-schedule p5b gamble was dropped in favor of the unmeasured
# VERDICT items: satellite tiled rows (#2), the compile-cache artifact
# (#5), a t1+t5 champion ensemble (maximally decorrelated pair:
# different norm family AND different init), and the p5 mid sweep.
cd /root/repo
mkdir -p runs/logs
set -x

END_TS=1787361000
have_minutes () {
  [ $(( $(date +%s) + $1 * 60 + 120 )) -lt $END_TS ]
}

AP=tools/ap_table.py
SB=runs/t2_sat/train_satellites/ckpt_5400
T1=runs/t1_crop/train/ckpt_9000
T5=runs/t5_fbn/train/ckpt_9000
P4=runs/p4_edge/train/ckpt_9000

commit_logs () {
  git add -f runs/logs/*.log 2>/dev/null
  git commit -m "$1" || true
}

# 1. satellite tiled-crop inference rows (VERDICT r5 #2)
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
  commit_logs "Satellite tiled-crop inference (512 native tiles): plain/maskness/vote"
fi

# 2. champion attempt: t1 + t5 two-model TTA voting ensemble
if [ ! -s runs/logs/eval_ens2_t5.log ] && have_minutes 40; then
  timeout 7200 python $AP --ckpt $T5 --modes bf16 --tta \
    --tta-scales 704,800,896 --vote 0.5 --maskness 1.0 \
    --ensemble $T1 --tta-only > runs/logs/eval_ens2_t5.log 2>&1
  commit_logs "2-model ensemble t5+t1 (TTA voting + maskness; cross-norm, cross-init pair)"
fi

# 3. compile-cache artifact for the flagship bench config (VERDICT #5)
if ! ls artifacts/compile_cache/*.tar.gz >/dev/null 2>&1 && \
   have_minutes 25; then
  timeout 3600 python tools/prime_compile_cache.py \
    > runs/logs/prime_cache.log 2>&1
  if ls artifacts/compile_cache/*.tar.gz >/dev/null 2>&1; then
    git add -f artifacts/compile_cache/*.tar.gz runs/logs/prime_cache.log
    git commit -m "Shipped compile-cache artifact: flagship bench config (cold start -> seconds)" || true
  fi
fi

# 4. p5 mid-checkpoint sweep
if [ -d runs/p5_ssl/train/ckpt_5400 ] && \
   [ ! -s runs/logs/eval_p5_mid.log ] && have_minutes 18; then
  timeout 3600 python $AP --ckpt runs/p5_ssl/train/ckpt_5400 \
    --modes bf16 --maskness 1.0 >> runs/logs/eval_p5_mid.log 2>&1
  commit_logs "p5 mid-checkpoint eval (val-loss minimum at 5400)"
fi

# 5. advisor r5 item 1: composed production config on t5 (the new
#    recommended artifact): int8bb + cap288 + maskness measured together
if ! grep -q AP runs/logs/eval_t5_composed.log 2>/dev/null && \
   have_minutes 18; then
  timeout 2400 python $AP --ckpt $T5 --modes int8bb --mask-cap 288 \
    --maskness 1.0 > runs/logs/eval_t5_composed.log 2>&1
  commit_logs "Composed production config measured on t5 (int8bb + cap288 + maskness)"
fi
echo R6FINAL_DONE
