#!/bin/bash
# Round-7 TPU queue. Priorities (VERDICT r5 + round-6 conclusions):
#   1. t6_sat — satellite retrain with the formula that won on powder
#      (FrozenBN + standardize + SSL-FrozenBN backbone graft): the
#      satellite plateau was diagnosed (round 6) as a training problem,
#      and FrozenBN+SSL is the only lever that moved single-pass AP
#      (+0.086 on particles). Target: AP > 0.30 (VERDICT r5 #2 bar).
#   2. ens3 — 3-model TTA ensemble t5+t1+p1 (+maskness): t5 is the
#      first non-distilled third model (cross-norm AND cross-init), so
#      unlike p2/p3/d1 its views are not teacher-correlated. Target:
#      beat the 0.699 champion.
#   3. p5b — t5's recipe on a 6000-iter schedule (decay at the observed
#      val-loss minimum region); round 6 ran out of clock mid-train.
#   4. s4 — spheroidite + SSL graft (transfer evidence beyond powder).
cd /root/repo
mkdir -p runs/logs
echo $$ > /tmp/r7.pid
trap 'rm -f /tmp/r7.pid' EXIT
set -x

END_TS=1787366700   # ~02:45 UTC, a few min before the round closes
have_minutes () {
  [ $(( $(date +%s) + $1 * 60 + 120 )) -lt $END_TS ]
}

AP=tools/ap_table.py
SSLF=runs/ssl_bb_fbn/ckpt_16000
SSL=runs/ssl_bb/ckpt_16000
T1=runs/t1_crop/train/ckpt_9000
P1=runs/p1_cp/train/ckpt_9000
T5=runs/t5_fbn/train/ckpt_9000
T6=runs/t6_sat/train_satellites
P5B=runs/p5b_short/train/ckpt_6000
S4=runs/s4_ssl/train/ckpt_4000

commit_logs () {
  git add -f runs/logs/*.log 2>/dev/null
  git commit -m "$1" || true
}
commit_ckpt () {
  git add -f "$1/$2" "$1/config.json" "$1/metrics.json" 2>/dev/null
  git commit -m "$3" || true
}

# 1. satellite retrain: tiny-object recipe + FrozenBN + standardize +
#    SSL-FrozenBN backbone (t5's winning combination, applied to the
#    dataset where detection-from-random-init is the binding constraint)
if [ -d $SSLF ] && [ ! -d $T6/ckpt_9000 ] && have_minutes 35; then
  timeout 3600 python examples/powder_workflow.py \
    --train-satellites --sat-native --max-iter 9000 \
    --lr 4e-3 --batch 2 --flip both --jitter 0.2 --ema 0.999 \
    --norm FrozenBN --standardize on \
    --init-backbone $SSLF \
    --outdir runs/t6_sat > runs/logs/t6_sat.log 2>&1
  commit_ckpt $T6 ckpt_5400 "t6: satellite recipe + FrozenBN/SSL backbone (ckpt_5400)"
  commit_ckpt $T6 ckpt_9000 "t6: satellite recipe + FrozenBN/SSL backbone (final)"
fi

# 2. t6 single-pass + maskness on both late checkpoints (fast rows;
#    baseline to beat: t2 ckpt_5400 single-pass 0.155, +mn ladder 0.262)
if [ -d $T6/ckpt_9000 ] && [ ! -s runs/logs/eval_t6.log ] && have_minutes 12; then
  for CK in ckpt_5400 ckpt_9000; do
    timeout 1800 python $AP --ckpt $T6/$CK --dataset powder_satellite \
      --modes bf16 --maskness 1.0 >> runs/logs/eval_t6.log 2>&1
  done
  commit_logs "t6 satellite single-pass evals (FrozenBN+SSL vs 0.155 baseline)"
fi

# 3. t6 full ladder at the known-best operating point: multi-scale TTA
#    + voting + detections 250 + maskness 1.0 (t2's 0.262 config)
if [ -d $T6/ckpt_5400 ] && [ ! -s runs/logs/eval_t6_tta.log ] && have_minutes 25; then
  timeout 2700 python $AP --ckpt $T6/ckpt_5400 --dataset powder_satellite \
    --modes bf16 --tta --tta-scales 896,1024,1152 --vote 0.5 \
    --detections 250 --maskness 1.0 --tta-only \
    > runs/logs/eval_t6_tta.log 2>&1
  commit_logs "t6 satellite TTA+vote+mn ladder (target >0.30, VERDICT r5 #2)"
fi

# 4. 3-model powder ensemble: t5 (FrozenBN+SSL) + t1 + p1, 36 views,
#    TTA voting + maskness (champion to beat: t1+p1+mn 0.699)
if [ ! -s runs/logs/eval_ens3_t5.log ] && have_minutes 30; then
  timeout 3600 python $AP --ckpt $T5 --modes bf16 --tta \
    --tta-scales 704,800,896 --vote 0.5 --maskness 1.0 \
    --ensemble $T1,$P1 --tta-only > runs/logs/eval_ens3_t5.log 2>&1
  commit_logs "3-model ensemble t5+t1+p1 (TTA voting + maskness, 36 views)"
fi

# 5. p5b: t5's exact recipe, 6000-iter schedule (decay at 4200/5400)
if [ -d $SSLF ] && [ ! -d $P5B ] && have_minutes 30; then
  timeout 2700 python examples/powder_workflow.py --train --max-iter 6000 \
    --lr 4e-3 --batch 2 --flip both --jitter 0.2 \
    --rotate 0,15,-15,30,-30 --ema 0.999 \
    --crop 704 --min-sizes 576,640,704 \
    --pseudo runs/pseudo2/particles.json \
    --edge-loss 0.5 \
    --norm FrozenBN --standardize on \
    --init-backbone $SSLF \
    --outdir runs/p5b_short > runs/logs/p5b_short.log 2>&1
  commit_ckpt runs/p5b_short/train ckpt_6000 \
    "p5b: FrozenBN+SSL recipe on a 6000-iter schedule"
fi
if [ -d $P5B ] && [ ! -s runs/logs/eval_p5b.log ] && have_minutes 10; then
  timeout 1800 python $AP --ckpt $P5B --modes bf16 --maskness 1.0 \
    > runs/logs/eval_p5b.log 2>&1
  commit_logs "p5b short-schedule eval (vs t5 0.639)"
fi

# 6. spheroidite + SSL backbone graft (GN recipe; transfer row)
if [ -d $SSL ] && [ ! -d $S4 ] && have_minutes 28; then
  timeout 2700 python examples/spheroidite_workflow.py --train \
    --max-iter 4000 --lr 2.5e-3 --batch 2 \
    --init-backbone $SSL \
    --outdir runs/s4_ssl > runs/logs/s4_ssl.log 2>&1
  commit_ckpt runs/s4_ssl/train ckpt_4000 \
    "s4: spheroidite model with SSL backbone graft"
fi
if [ -d $S4 ] && [ ! -s runs/logs/eval_s4.log ] && have_minutes 10; then
  timeout 1800 python $AP --ckpt $S4 --dataset spheroidite --modes bf16 \
    > runs/logs/eval_s4.log 2>&1
  commit_logs "Spheroidite SSL-backbone eval (vs 0.174 from-scratch)"
fi
echo R7_DONE
