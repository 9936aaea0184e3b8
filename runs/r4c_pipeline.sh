#!/bin/bash
# Round-4 tail (manual takeover of r4_pipeline.sh after the d1 evals):
# reprioritized for the remaining wall-clock — p4 edge-agreement
# measurement first (VERDICT Weak #1), then satellite levers, then the
# cheap spheroidite/mask-res items if the round is still alive.
cd /root/repo
mkdir -p runs/logs
set -x

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
SB=runs/t2_sat/train_satellites/ckpt_5400

# 1. edge-agreement model (exact p2 protocol + --edge-loss 0.5: the
#    paired lever measurement)
if [ ! -d $P4 ] && [ -f runs/pseudo2/particles.json ]; then
  timeout 10800 python examples/powder_workflow.py --train --max-iter 9000 \
    --lr 4e-3 --batch 2 --flip both --jitter 0.2 \
    --rotate 0,15,-15,30,-30 --ema 0.999 \
    --crop 704 --min-sizes 576,640,704 \
    --pseudo runs/pseudo2/particles.json \
    --edge-loss 0.5 \
    --outdir runs/p4_edge > runs/logs/p4_edge.log 2>&1
  commit_ckpt runs/p4_edge/train ckpt_9000 \
    "Edge-agreement loss model: crop recipe + pseudo2 + edge 0.5"
fi

# 2. its single-pass measurement (base + maskness; p2's same rows are
#    0.624 / 0.632, so the edge-loss delta reads directly)
[ -d $P4 ] && [ ! -s runs/logs/eval_p4.log ] && timeout 3600 \
  python $AP --ckpt $P4 --modes bf16 > runs/logs/eval_p4.log 2>&1
[ -d $P4 ] && [ ! -s runs/logs/eval_p4_mn.log ] && timeout 3600 \
  python $AP --ckpt $P4 --modes bf16 --maskness 1.0 \
  > runs/logs/eval_p4_mn.log 2>&1
commit_logs "Edge-agreement lever measurement (powder, single-pass)"

# 3. int8-mask-head + cap288 bench (GN-checkpoint production config) and
#    56-res mask-head throughput cost (quality runs deferred; see
#    docs/parity.md)
#    pure-bf16 with cap-288 first: VERDICT #5 wants bf16 >= 5x
#    (116.5 img/s); 113.6 + the ~11 img/s compaction win should clear
#    it. The r4 queue's attempt was interrupted (4-line log, no JSON).
grep -q '"metric"' runs/logs/bench_bf16_cap288.log 2>/dev/null || \
  BENCH_INT8=0 BENCH_INT8_BB=0 timeout 2400 python bench.py \
  > runs/logs/bench_bf16_cap288.log 2>&1
commit_logs "Pure-bf16 bench with mask-cap 288 (VERDICT #5)"

BENCH_INT8_BB=0 timeout 2400 python bench.py \
  > runs/logs/bench_int8mh_cap288.log 2>&1
BENCH_MASK_RES=56 BENCH_INT8=0 BENCH_INT8_BB=0 timeout 2400 python bench.py \
  > runs/logs/bench_maskres56.log 2>&1
commit_logs "Bench: int8-mask-head+cap288 production row; 56x56 head throughput cost"

#    56-res mask quality at inference time on the best single-pass
#    checkpoint (mask-head params are resolution-independent; VERDICT
#    Weak #1b wants a quality row, not just throughput)
[ ! -s runs/logs/eval_p2_mr56.log ] && timeout 3600 python $AP \
  --ckpt $P2 --modes bf16 --mask-res 56 \
  > runs/logs/eval_p2_mr56.log 2>&1
commit_logs "56x56 mask head quality measurement (inference-time, p2 checkpoint)"

#    2-model ensemble + maskness: the least teacher-correlated pair
#    (t1+p1, 0.673 plain — the dilution ladder peak) with recalibrated
#    votes; maskness lifted the 4-model 0.664 -> 0.692, so this is the
#    likeliest new ladder best (24 views, ~18 min)
[ ! -s runs/logs/eval_ens2_mn.log ] && timeout 3600 python $AP \
  --ckpt $T1 --modes bf16 --tta --tta-scales 704,800,896 --vote 0.5 \
  --tta-only --maskness 1.0 --ensemble $P1 \
  > runs/logs/eval_ens2_mn.log 2>&1
commit_logs "2-model ensemble + maskness eval"

# 4. satellite maskness/rotation levers
for a in 1.0 2.0; do
  [ ! -s runs/logs/eval_sat_mn_$a.log ] && timeout 3600 python $AP \
    --ckpt $SB --dataset powder_satellite --detections 250 --modes bf16 \
    --tta --tta-scales 896,1024,1152 --vote 0.5 --tta-only --maskness $a \
    > runs/logs/eval_sat_mn_$a.log 2>&1
done
commit_logs "Satellite maskness sweeps"

# 5. d1 TTA + maskness (potential new ladder best) — only reached if the
#    round still has wall-clock
D1=runs/d1_distill/train/ckpt_9000
[ -d $D1 ] && timeout 3600 python $AP --ckpt $D1 --modes bf16 \
  --maskness 1.0 --tta --tta-scales 704,800,896 --vote 0.5 --tta-only \
  > runs/logs/eval_d1_tta_mn.log 2>&1
commit_logs "Distilled model TTA + maskness"

# 6. 5-model ensemble + maskness (60 views)
if [ -d $P4 ] && [ -d $P3 ] && [ ! -s runs/logs/eval_ens5.log ]; then
  timeout 9000 python $AP --ckpt $P2 --modes bf16 \
    --tta --tta-scales 704,800,896 --vote 0.5 --tta-only --maskness 1.0 \
    --ensemble $T1,$P1,$P3,$P4 > runs/logs/eval_ens5.log 2>&1
  commit_logs "5-model ensemble eval (maskness)"
fi

# 7. spheroidite edge-loss run (cheap second dataset for the lever)
if [ ! -d runs/s2_edge/train/ckpt_4000 ]; then
  timeout 10800 python examples/spheroidite_workflow.py --train \
    --max-iter 4000 --lr 2.5e-3 --batch 2 --edge-loss 0.5 \
    --outdir runs/s2_edge > runs/logs/s2_edge.log 2>&1
  commit_ckpt runs/s2_edge/train ckpt_4000 \
    "Edge-agreement loss model: spheroidite"
fi
[ -d runs/s2_edge/train/ckpt_4000 ] && timeout 2400 python $AP \
  --ckpt runs/s2_edge/train/ckpt_4000 --dataset spheroidite --modes bf16 \
  > runs/logs/eval_s2_edge.log 2>&1
commit_logs "Edge-agreement lever measurement (spheroidite)"

echo R4C_PIPELINE_DONE
