#!/bin/bash
# Round-4 final tail, v3 (replaces r4f mid-flight; pseudo3 keeps running
# as an orphan and step 0 just waits for its output).
#
# Change vs r4f: pseudo3 finishing ~14:05 would push d1's training to
# ~15:05, leaving BOTH round-4 levers (edge-agreement, distillation)
# trained but unmeasured if the round ends near 15:10 — the exact
# anti-pattern VERDICT r2/r3 penalized. So the two highest-value
# measurements run BEFORE d1's training (~22 min): eval_p4 closes
# VERDICT Weak #1a (edge loss needs an AP row), the bf16+cap288 bench
# closes Weak #3 (bf16 >= 5x). d1 then trains with intermediate
# checkpoints committed every 1800 iters; if the round ends mid-run,
# round 5 resumes the last ~1800-3600 iters from git.
cd /root/repo
mkdir -p runs/logs
set -x

END_TS=1787238492   # soft round-end estimate (~15:10Z); post-d1 only
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
P4=runs/p4_edge/train/ckpt_9000
D1=runs/d1_distill/train/ckpt_9000

# 0. wait for the orphaned pseudo3 labeler (PID via /tmp/pseudo3.pid),
#    then commit its output
PSPID=$(cat /tmp/pseudo3.pid 2>/dev/null)
while [ -n "$PSPID" ] && kill -0 "$PSPID" 2>/dev/null; do
  sleep 45
done
sleep 5
if [ -f runs/pseudo3/particles.json ]; then
  git add -f runs/pseudo3/particles.json && \
    git commit -m "Round-3 pseudo-labels from the 4-model TTA ensemble (maskness-rescored)" || true
fi

# 1. edge-agreement lever measurement (vs p2's plain 0.624)
if [ -d $P4 ] && [ ! -s runs/logs/eval_p4.log ]; then
  timeout 3600 python $AP --ckpt $P4 --modes bf16 \
    > runs/logs/eval_p4.log 2>&1
  commit_logs "Edge-agreement lever measurement (powder, single-pass)"
fi

# 2. pure-bf16 + cap-288 bench (VERDICT #5: bf16 >= 5x = 116.5 img/s)
if ! grep -q '"metric"' runs/logs/bench_bf16_cap288.log 2>/dev/null; then
  BENCH_INT8=0 BENCH_INT8_BB=0 timeout 2400 python bench.py \
    > runs/logs/bench_bf16_cap288.log 2>&1
  commit_logs "Pure-bf16 bench with mask-cap 288 (VERDICT #5)"
fi

# 3. distilled single-pass model (p2's exact recipe/schedule on the
#    4-model-ensemble labels), intermediate checkpoints committed
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

# 4. post-d1 evals, clock-guarded (cheap to re-run in round 5; keep the
#    TPU free near the driver's end-of-round bench)
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

# 5. guarded leftovers
if have_minutes 20; then
  bash runs/r4c_pipeline.sh > runs/logs/r4c_pipeline.log 2>&1
fi

echo R4G_PIPELINE_DONE
