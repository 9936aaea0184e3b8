#!/bin/bash
# Round-3 phase 3 (auto-chained after runs/r3_phase2.sh):
# measure the edge-agreement auxiliary mask loss (arXiv:1809.07069,
# wired as cfg.MODEL.ROI_MASK_HEAD.EDGE_AGREEMENT but never measured on
# hardware — the round-2 verdict penalized exactly this pattern for
# int8), then fold the new model into a 5-model ensemble. A cheap
# spheroidite edge run gives the lever a second dataset.
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

# 1. edge-agreement model: crop-704 recipe on GT + round-2 pseudo tiles
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

# 2. evaluate it: base + TTA + vote (compare against p2/p3 rows)
[ -d $P4 ] && timeout 3600 python $AP --ckpt $P4 --modes bf16 \
  --tta --tta-scales 704,800,896 --vote 0.5 \
  > runs/logs/eval_p4.log 2>&1
commit_logs "Edge-agreement lever measurement (powder)"

# 3. 5-model ensemble (60 views)
if [ -d $P4 ] && [ -d $P3 ]; then
  timeout 9000 python $AP --ckpt $P2 --modes bf16 \
    --tta --tta-scales 704,800,896 --vote 0.5 --tta-only \
    --ensemble $T1,$P1,$P3,$P4 > runs/logs/eval_ens5.log 2>&1
  commit_logs "5-model ensemble eval"
fi

# 4. spheroidite + edge loss (cheap second-dataset measurement)
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

echo PHASE3_DONE
