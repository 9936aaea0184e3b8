#!/bin/bash
# Round-4 final tail, v2 (replaces r4e).
#
# Change vs r4e: the d1_distill training runs UNCONDITIONALLY with a
# checkpoint watcher that git-commits every intermediate checkpoint
# (period = max_iter/5 = 1800) as it lands. Rationale: the round-end
# estimate is soft (round 3's PROGRESS shows wall clocks far past 6 h),
# so a hard clock guard could wrongly skip the round's most important
# artifact; with incremental commits an interrupt costs nothing — round
# 5 resumes via --resume from the last committed checkpoint. Evals keep
# clock guards: they are cheap to re-run from committed checkpoints.
cd /root/repo
mkdir -p runs/logs
set -x

END_TS=1787238492   # driver PROGRESS-derived round-end estimate (~15:10Z)
have_minutes () {
  [ $(( $(date +%s) + $1 * 60 + 180 )) -lt $END_TS ]
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

# 0. wait for the in-flight p4_edge training, then commit its checkpoint
P4PID=$(cat /tmp/p4train.pid 2>/dev/null)
while [ -n "$P4PID" ] && kill -0 "$P4PID" 2>/dev/null; do
  sleep 60
done
sleep 10
for ck in ckpt_9000 ckpt_7200 ckpt_5400; do
  [ -d runs/p4_edge/train/$ck ] && {
    commit_ckpt runs/p4_edge/train $ck \
      "Edge-agreement loss model: crop recipe + pseudo2 + edge 0.5 ($ck)"
    break
  }
done

# 1. round-3 pseudo-labels from the strongest measured labeler (4-model
#    TTA-voted ensemble + maskness = 0.692) — ~16 min
if [ ! -f runs/pseudo3/particles.json ] && [ -d $P3 ]; then
  timeout 7200 python tools/pseudo_label.py \
    --ckpt $P2 \
    --images /root/reference/examples/powder/data/images_png \
    --exclude Sc1Tile_001-001,Sc1Tile_001-002,Sc2Tile_001-001,Sc3Tile_008-007,Sc2Tile_010-006,Sc3Tile_010-001 \
    --out runs/pseudo3/particles.json --score-thresh 0.7 \
    --tta --tta-scales 704,800,896 --vote 0.5 --maskness 1.0 \
    --ensemble $T1,$P1,$P3 \
    > runs/logs/pseudo3.log 2>&1
  git add -f runs/pseudo3/particles.json && \
    git commit -m "Round-3 pseudo-labels from the 4-model TTA ensemble (maskness-rescored)" || true
fi

# 2. distilled single-pass model (p2's exact recipe/schedule on the
#    denser labels), checkpoint-watched so every intermediate landing is
#    committed; resumes from the last one after an interrupt
if [ ! -d $D1 ] && [ -f runs/pseudo3/particles.json ]; then
  RESUME=""
  ls -d runs/d1_distill/train/ckpt_* >/dev/null 2>&1 && RESUME="--resume"
  ( while true; do
      for d in runs/d1_distill/train/ckpt_*; do
        [ -d "$d" ] || continue
        git ls-files --error-unmatch "$d" >/dev/null 2>&1 && continue
        sleep 5   # let orbax finish writing
        git add -f "$d" runs/d1_distill/train/config.json \
          runs/d1_distill/train/metrics.json 2>/dev/null
        git commit -m "d1_distill intermediate checkpoint ${d##*/} (reset-proof)" || true
      done
      sleep 120
    done ) & WATCH=$!
  timeout 10800 python examples/powder_workflow.py --train --max-iter 9000 \
    --lr 4e-3 --batch 2 --flip both --jitter 0.2 \
    --rotate 0,15,-15,30,-30 --ema 0.999 \
    --crop 704 --min-sizes 576,640,704 \
    --pseudo runs/pseudo3/particles.json $RESUME \
    --outdir runs/d1_distill > runs/logs/d1_distill.log 2>&1
  kill $WATCH 2>/dev/null
  commit_ckpt runs/d1_distill/train ckpt_9000 \
    "Distilled single-pass model: p2 recipe on GT + 4-model-ensemble labels"
fi

# 3. remaining window, value order (each re-runnable in round 5)
if [ -d $P4 ] && [ ! -s runs/logs/eval_p4.log ] && have_minutes 14; then
  timeout 3600 python $AP --ckpt $P4 --modes bf16 \
    > runs/logs/eval_p4.log 2>&1
  commit_logs "Edge-agreement lever measurement (powder, single-pass)"
fi

if ! grep -q '"metric"' runs/logs/bench_bf16_cap288.log 2>/dev/null \
   && have_minutes 8; then
  BENCH_INT8=0 BENCH_INT8_BB=0 timeout 2400 python bench.py \
    > runs/logs/bench_bf16_cap288.log 2>&1
  commit_logs "Pure-bf16 bench with mask-cap 288 (VERDICT #5)"
fi

if [ -d $D1 ] && [ ! -s runs/logs/eval_d1.log ] && have_minutes 14; then
  timeout 3600 python $AP --ckpt $D1 --modes bf16 \
    > runs/logs/eval_d1.log 2>&1
  commit_logs "Distilled model eval: single-pass (production artifact row)"
fi

if [ -d $P4 ] && [ ! -s runs/logs/eval_p4_mn.log ] && have_minutes 14; then
  timeout 3600 python $AP --ckpt $P4 --modes bf16 --maskness 1.0 \
    > runs/logs/eval_p4_mn.log 2>&1
  commit_logs "Edge-agreement model + maskness"
fi

if [ -d $D1 ] && [ ! -s runs/logs/eval_d1_mn.log ] && have_minutes 14; then
  timeout 3600 python $AP --ckpt $D1 --modes bf16 --maskness 1.0 \
    > runs/logs/eval_d1_mn.log 2>&1
  commit_logs "Distilled model + maskness"
fi

# 4. guarded leftovers (r4c skips anything already logged; no clock
#    guards inside, so only enter with a real window)
if have_minutes 20; then
  bash runs/r4c_pipeline.sh > runs/logs/r4c_pipeline.log 2>&1
fi

echo R4F_PIPELINE_DONE
