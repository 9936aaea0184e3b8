#!/bin/bash
# Round-6 tail, rebalanced for the remaining clock. r6_pipeline stages
# 6-7 were gated off (placeholder logs) and their work moved here at
# lower priority; p5b (the most promising quality lever after p5's
# val-loss minimum landed mid-schedule) runs first.
cd /root/repo
mkdir -p runs/logs
set -x

END_TS=1787361000   # ~01:10 UTC, a few min before the round closes
have_minutes () {
  [ $(( $(date +%s) + $1 * 60 + 120 )) -lt $END_TS ]
}

AP=tools/ap_table.py
SB=runs/t2_sat/train_satellites/ckpt_5400
SSL=runs/ssl_bb/ckpt_16000
T1=runs/t1_crop/train/ckpt_9000
P4=runs/p4_edge/train/ckpt_9000
T6=runs/t6_sat/train_satellites/ckpt_9000
S4=runs/s4_ssl/train/ckpt_4000
P5B=runs/p5b_short/train/ckpt_6000

commit_logs () {
  git add -f runs/logs/*.log 2>/dev/null
  git commit -m "$1" || true
}
commit_ckpt () {
  git add -f "$1/$2" "$1/config.json" "$1/metrics.json" 2>/dev/null
  git commit -m "$3" || true
}

# 1. p5b: short schedule matched to the SSL init (6000 iters -> LR
#    decays at 4200/5400, around where p5's val loss bottomed)
if [ -d $SSL ] && [ ! -d $P5B ] && have_minutes 75; then
  timeout 7200 python examples/powder_workflow.py --train --max-iter 6000 \
    --lr 4e-3 --batch 2 --flip both --jitter 0.2 \
    --rotate 0,15,-15,30,-30 --ema 0.999 \
    --crop 704 --min-sizes 576,640,704 \
    --pseudo runs/pseudo2/particles.json \
    --edge-loss 0.5 \
    --init-backbone $SSL \
    --outdir runs/p5b_short > runs/logs/p5b_short.log 2>&1
  commit_ckpt runs/p5b_short/train ckpt_6000 \
    "p5b: SSL init + 6000-iter schedule (decay at the val-loss minimum)"
fi
if [ -d $P5B ] && [ ! -s runs/logs/eval_p5b.log ] && have_minutes 15; then
  timeout 3600 python $AP --ckpt $P5B --modes bf16 --maskness 1.0 \
    > runs/logs/eval_p5b.log 2>&1
  commit_logs "p5b short-schedule eval (single-pass + maskness)"
fi

# 2. p5 mid-checkpoint sweep (val-loss minimum at 5400)
if [ -d runs/p5_ssl/train/ckpt_5400 ] && \
   [ ! -s runs/logs/eval_p5_mid.log ] && have_minutes 20; then
  for CK in ckpt_5400 ckpt_7200; do
    timeout 3600 python $AP --ckpt runs/p5_ssl/train/$CK --modes bf16 \
      --maskness 1.0 >> runs/logs/eval_p5_mid.log 2>&1
  done
  commit_logs "p5 mid-checkpoint sweep (val-loss minimum at 5400)"
fi

# 3. satellite tiled-crop inference rows (VERDICT r5 #2)
if [ -d $SB ] && [ ! -s runs/logs/eval_sat_tiled.log ] && \
   have_minutes 25; then
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

# 4. compile-cache artifact for the flagship bench config (VERDICT #5)
if ! ls artifacts/compile_cache/*.tar.gz >/dev/null 2>&1 && \
   have_minutes 20; then
  timeout 3600 python tools/prime_compile_cache.py \
    > runs/logs/prime_cache.log 2>&1
  if ls artifacts/compile_cache/*.tar.gz >/dev/null 2>&1; then
    git add -f artifacts/compile_cache/*.tar.gz runs/logs/prime_cache.log
    git commit -m "Shipped compile-cache artifact: flagship bench config (cold start -> seconds)" || true
  fi
fi

# 5. champion refresh: 2-model TTA+vote+maskness ensemble of t1 and the
#    best available SSL-init variant
if [ ! -s runs/logs/eval_ens2_ssl.log ] && have_minutes 45; then
  BEST=runs/p5_ssl/train/ckpt_5400
  [ -d $P5B ] && BEST=$P5B
  timeout 7200 python $AP --ckpt $BEST --modes bf16 --tta \
    --tta-scales 704,800,896 --vote 0.5 --maskness 1.0 \
    --ensemble $T1 --tta-only > runs/logs/eval_ens2_ssl.log 2>&1
  commit_logs "2-model ensemble: t1 + SSL-init model (TTA voting + maskness)"
fi

# 6. advisor r5 item 1: composed production config on p4
if [ -d $P4 ] && ! grep -q AP runs/logs/eval_p4_composed.log 2>/dev/null \
   && have_minutes 20; then
  timeout 2400 python $AP --ckpt $P4 --modes int8 --mask-cap 288 \
    --maskness 1.0 > runs/logs/eval_p4_composed.log 2>&1
  commit_logs "Composed production config measured on p4 (advisor r5 item 1)"
fi

# 7. satellite retrain with the SSL backbone
if [ -d $SSL ] && [ ! -d $T6 ] && have_minutes 90; then
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
if [ -d $T6 ] && [ ! -s runs/logs/eval_t6_sat.log ] && have_minutes 30; then
  for CK in ckpt_5400 ckpt_9000; do
    timeout 2400 python $AP --ckpt runs/t6_sat/train_satellites/$CK \
      --dataset powder_satellite --modes bf16 --maskness 1.0 \
      >> runs/logs/eval_t6_sat.log 2>&1
  done
  commit_logs "SSL-backbone satellite model rows"
fi

# 8. spheroidite + SSL backbone
if [ -d $SSL ] && [ ! -d $S4 ] && have_minutes 50; then
  timeout 7200 python examples/spheroidite_workflow.py --train \
    --max-iter 4000 --lr 2.5e-3 --batch 2 \
    --init-backbone $SSL \
    --outdir runs/s4_ssl > runs/logs/s4_ssl.log 2>&1
  commit_ckpt runs/s4_ssl/train ckpt_4000 \
    "s4: spheroidite model with SSL backbone graft"
fi
if [ -d $S4 ] && [ ! -s runs/logs/eval_s4.log ] && have_minutes 15; then
  timeout 2400 python $AP --ckpt $S4 --dataset spheroidite --modes bf16 \
    > runs/logs/eval_s4.log 2>&1
  commit_logs "Spheroidite SSL-backbone model eval (vs 0.174 from-scratch)"
fi
echo R6TAIL_DONE
