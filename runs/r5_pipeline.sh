#!/bin/bash
# Round-5 queue. Strictly sequential TPU use (one client at a time —
# the r4h duplicate-client incident wedged the tunnel for ~25 min).
# Priority order:
#   1. d1 distillation training (VERDICT Missing #2 / top_next): crop
#      recipe + pseudo3 (4-model TTA+maskness ensemble labels) +
#      edge-loss 0.5 (both measured-positive levers stacked).
#      Incremental checkpoint commits (reset-proof).
#   2. d1 evals: single-pass, +maskness, +TTA+vote+maskness.
#   3. Unmeasured round-4 leftovers: p4+maskness, 56x56 mask head
#      (quality + bench), int8mh+cap288 bench row, 2-model ensemble +
#      maskness (likeliest ladder best).
#   4. Satellite levers: maskness 1.0/2.0 sweep + 56-res mask head at
#      the best operating point (tiny objects gain most from mask res).
#   5. Spheroidite: edge-loss run + self-distillation run (VERDICT #7).
#   6. 5-model ensemble (60 views) if the clock allows.
cd /root/repo
mkdir -p runs/logs
set -x

[ -f /tmp/round_end_ts ] || echo 1787277238 > /tmp/round_end_ts
have_minutes () {
  [ $(( $(date +%s) + $1 * 60 + 180 )) -lt "$(cat /tmp/round_end_ts)" ]
}

commit_logs () {
  git add -f runs/logs/*.log 2>/dev/null
  git commit -m "$1" || true
}
commit_ckpt () {
  git add -f "$1/$2" "$1/config.json" "$1/metrics.json" 2>/dev/null
  git commit -m "$3" || true
}

AP=tools/ap_table.py
T1=runs/t1_crop/train/ckpt_9000
P1=runs/p1_cp/train/ckpt_9000
P2=runs/p2_pseudo/train/ckpt_9000
P3=runs/p3_pseudo2/train/ckpt_9000
P4=runs/p4_edge/train/ckpt_9000
D1=runs/d1_distill/train/ckpt_9000
SB=runs/t2_sat/train_satellites/ckpt_5400
# NOTE (r5 advisor): wrong path — the spheroidite checkpoint is
# ckpt_4000, so the S1 pseudo-label stage below would fail. Superseded
# by runs/r5c_pipeline.sh, which uses the correct path; kept as-run for
# the log record.
S1=runs/t3_sph/train/ckpt_6000

# ---------------------------------------------------------------- 1. d1
if [ ! -d $D1 ] && [ -f runs/pseudo3/particles.json ]; then
  RESUME=""
  ls -d runs/d1_distill/train/ckpt_* >/dev/null 2>&1 && RESUME="--resume"
  ( while true; do
      for d in runs/d1_distill/train/ckpt_*; do
        [ -d "$d" ] || continue
        git ls-files --error-unmatch "$d" >/dev/null 2>&1 && continue
        sleep 5
        git add -f "$d" runs/d1_distill/train/config.json \
          runs/d1_distill/train/metrics.json 2>/dev/null
        git commit -m "d1_distill intermediate checkpoint ${d##*/} (reset-proof)" || true
      done
      sleep 120
    done ) & WATCH=$!
  timeout 9000 python examples/powder_workflow.py --train --max-iter 9000 \
    --lr 4e-3 --batch 2 --flip both --jitter 0.2 \
    --rotate 0,15,-15,30,-30 --ema 0.999 \
    --crop 704 --min-sizes 576,640,704 \
    --pseudo runs/pseudo3/particles.json \
    --edge-loss 0.5 $RESUME \
    --outdir runs/d1_distill > runs/logs/d1_distill.log 2>&1
  # NOTE (r5 advisor): kill can interrupt the watcher mid git-add and
  # leave a stale index.lock that the `|| true` in commit_ckpt would
  # swallow. Later pipelines wait for the watcher's iteration to finish
  # and clear a stale lock before the final commit (see r6_pipeline.sh).
  kill $WATCH 2>/dev/null
  commit_ckpt runs/d1_distill/train ckpt_9000 \
    "Distilled single-pass model: crop+edge recipe on GT + 4-model-ensemble pseudo-labels"
fi

# ------------------------------------------------------------ 2. d1 evals
if [ -d $D1 ]; then
  [ ! -s runs/logs/eval_d1.log ] && timeout 3600 python $AP \
    --ckpt $D1 --modes bf16 > runs/logs/eval_d1.log 2>&1
  [ ! -s runs/logs/eval_d1_mn.log ] && timeout 3600 python $AP \
    --ckpt $D1 --modes bf16 --maskness 1.0 > runs/logs/eval_d1_mn.log 2>&1
  commit_logs "Distilled model: single-pass + maskness evals (production artifact rows)"
  if have_minutes 25 && [ ! -s runs/logs/eval_d1_tta_mn.log ]; then
    timeout 3600 python $AP --ckpt $D1 --modes bf16 \
      --tta --tta-scales 704,800,896 --vote 0.5 --tta-only --maskness 1.0 \
      > runs/logs/eval_d1_tta_mn.log 2>&1
    commit_logs "Distilled model TTA + voting + maskness"
  fi
fi

# ---------------------------------------------- 3. round-4 leftover evals
[ ! -s runs/logs/eval_p4_mn.log ] && timeout 3600 python $AP \
  --ckpt $P4 --modes bf16 --maskness 1.0 > runs/logs/eval_p4_mn.log 2>&1
commit_logs "Edge-agreement model + maskness (single-pass ladder)"

[ ! -s runs/logs/eval_p2_mr56.log ] && timeout 3600 python $AP \
  --ckpt $P2 --modes bf16 --mask-res 56 > runs/logs/eval_p2_mr56.log 2>&1
commit_logs "56x56 mask head quality (inference-time, best single-pass ckpt)"

grep -q '"metric"' runs/logs/bench_maskres56.log 2>/dev/null || \
  BENCH_MASK_RES=56 BENCH_INT8=0 BENCH_INT8_BB=0 timeout 2400 python bench.py \
  > runs/logs/bench_maskres56.log 2>&1
grep -q '"metric"' runs/logs/bench_int8mh_cap288.log 2>/dev/null || \
  BENCH_INT8_BB=0 timeout 2400 python bench.py \
  > runs/logs/bench_int8mh_cap288.log 2>&1
commit_logs "Bench rows: 56x56 mask head cost; int8-mask-head-only + cap288"

if have_minutes 25 && [ ! -s runs/logs/eval_ens2_mn.log ]; then
  timeout 3600 python $AP --ckpt $T1 --modes bf16 \
    --tta --tta-scales 704,800,896 --vote 0.5 --tta-only --maskness 1.0 \
    --ensemble $P1 > runs/logs/eval_ens2_mn.log 2>&1
  commit_logs "2-model ensemble + maskness eval (t1+p1, least teacher-correlated pair)"
fi

# ------------------------------------------------- 4. satellite levers
for a in 1.0 2.0; do
  [ ! -s runs/logs/eval_sat_mn_$a.log ] && have_minutes 20 && \
    timeout 3600 python $AP --ckpt $SB --dataset powder_satellite \
    --detections 250 --modes bf16 --tta --tta-scales 896,1024,1152 \
    --vote 0.5 --tta-only --maskness $a \
    > runs/logs/eval_sat_mn_$a.log 2>&1
done
commit_logs "Satellite maskness alpha sweep at the best operating point"

if have_minutes 20 && [ ! -s runs/logs/eval_sat_mr56.log ]; then
  timeout 3600 python $AP --ckpt $SB --dataset powder_satellite \
    --detections 250 --modes bf16 --tta --tta-scales 896,1024,1152 \
    --vote 0.5 --tta-only --maskness 1.0 --mask-res 56 \
    > runs/logs/eval_sat_mr56.log 2>&1
  commit_logs "Satellite 56x56 mask head at the best TTA operating point"
fi

# ------------------------------------------------- 5. spheroidite runs
if have_minutes 50 && [ ! -d runs/s2_edge/train/ckpt_4000 ]; then
  timeout 4500 python examples/spheroidite_workflow.py --train \
    --max-iter 4000 --lr 2.5e-3 --batch 2 --edge-loss 0.5 \
    --outdir runs/s2_edge > runs/logs/s2_edge.log 2>&1
  commit_ckpt runs/s2_edge/train ckpt_4000 \
    "Edge-agreement loss model: spheroidite"
fi
if [ -d runs/s2_edge/train/ckpt_4000 ] && [ ! -s runs/logs/eval_s2_edge.log ]; then
  timeout 2400 python $AP --ckpt runs/s2_edge/train/ckpt_4000 \
    --dataset spheroidite --modes bf16 > runs/logs/eval_s2_edge.log 2>&1
  commit_logs "Edge-agreement lever measurement (spheroidite)"
fi

# spheroidite self-distillation (VERDICT #7): pseudo-label the train
# images with the best available model + TTA, retrain on GT + pseudo
if have_minutes 60 && [ ! -f runs/pseudo_sph/spheroidite.json ]; then
  timeout 3600 python tools/pseudo_label.py \
    --ckpt $S1 \
    --images /root/reference/examples/spheroidite/data/images \
    --exclude valid_ \
    --out runs/pseudo_sph/spheroidite.json --score-thresh 0.7 \
    --tta --tta-scales 481,540,600 --vote 0.5 --maskness 1.0 \
    > runs/logs/pseudo_sph.log 2>&1
  [ -f runs/pseudo_sph/spheroidite.json ] && \
    git add -f runs/pseudo_sph/spheroidite.json && \
    git commit -m "Spheroidite self-distillation pseudo-labels (TTA-voted, maskness)" || true
fi
if have_minutes 50 && [ -f runs/pseudo_sph/spheroidite.json ] && \
   [ ! -d runs/s3_pseudo/train/ckpt_4000 ]; then
  timeout 4500 python examples/spheroidite_workflow.py --train \
    --max-iter 4000 --lr 2.5e-3 --batch 2 \
    --pseudo runs/pseudo_sph/spheroidite.json \
    --outdir runs/s3_pseudo > runs/logs/s3_pseudo.log 2>&1
  commit_ckpt runs/s3_pseudo/train ckpt_4000 \
    "Spheroidite self-distillation model (GT + TTA-ensemble pseudo-labels)"
fi
if [ -d runs/s3_pseudo/train/ckpt_4000 ] && [ ! -s runs/logs/eval_s3.log ]; then
  timeout 2400 python $AP --ckpt runs/s3_pseudo/train/ckpt_4000 \
    --dataset spheroidite --modes bf16 > runs/logs/eval_s3.log 2>&1
  commit_logs "Spheroidite self-distillation eval"
fi

# --------------------------------------------------- 6. 5-model ensemble
if have_minutes 55 && [ ! -s runs/logs/eval_ens5.log ]; then
  timeout 9000 python $AP --ckpt $P2 --modes bf16 \
    --tta --tta-scales 704,800,896 --vote 0.5 --tta-only --maskness 1.0 \
    --ensemble $T1,$P1,$P3,$P4 > runs/logs/eval_ens5.log 2>&1
  commit_logs "5-model ensemble eval (60 views, maskness)"
fi

echo R5_PIPELINE_DONE
