#!/bin/bash
# Round-3 phase 2 (auto-chained after runs/r3_eval.sh):
# 1. reset-proof the raw eval logs,
# 2. cheap satellite inference sweeps toward the AP>=0.25 target,
# 3. self-training round 2: re-pseudo-label with the 3-model ensemble,
#    train a 4th (diversity: 640-crop) model on GT+pseudo2,
# 4. evaluate it alone and in the 4-model ensemble.
# Everything that matters is committed as it lands (env resets wipe runs/).
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
SB=runs/t2_sat/train_satellites/ckpt_5400

# 0. the phase-1 eval logs are the round's measurements — commit them first
commit_logs "Round-3 eval queue raw logs (reset-proof)"

# 1. satellite: vote-threshold and detection-cap sweeps around the 0.249
#    config (scales 896/1024/1152, h+v flips, detections 250, vote 0.5)
for v in 0.4 0.6; do
  [ -d $SB ] && timeout 3600 python $AP --ckpt $SB \
    --dataset powder_satellite --detections 250 --modes bf16 \
    --tta --tta-scales 896,1024,1152 --vote $v --tta-only \
    > runs/logs/eval_sat_vote_$v.log 2>&1
done
[ -d $SB ] && timeout 3600 python $AP --ckpt $SB \
  --dataset powder_satellite --detections 300 --modes bf16 \
  --tta --tta-scales 896,1024,1152 --vote 0.5 --tta-only \
  > runs/logs/eval_sat_det300.log 2>&1
commit_logs "Satellite vote/detection-cap sweeps around the 0.249 config"

# 2. self-training round 2: pseudo-label the 5 unlabeled tiles with the
#    3-model TTA-voted ensemble (p2 primary + t1 + p1 = 36 views)
if [ ! -f runs/pseudo2/particles.json ] && [ -d $P2 ]; then
  timeout 7200 python tools/pseudo_label.py \
    --ckpt $P2 \
    --images /root/reference/examples/powder/data/images_png \
    --exclude Sc1Tile_001-001,Sc1Tile_001-002,Sc2Tile_001-001,Sc3Tile_008-007,Sc2Tile_010-006,Sc3Tile_010-001 \
    --out runs/pseudo2/particles.json --score-thresh 0.7 \
    --tta --tta-scales 704,800,896 --vote 0.5 \
    --ensemble $T1,$P1 \
    > runs/logs/pseudo2.log 2>&1
  git add -f runs/pseudo2/particles.json && \
    git commit -m "Round-2 pseudo-labels from the 3-model TTA ensemble" || true
fi

# 3. 4th model: crop recipe at a different crop band (640/512-640) for
#    ensemble diversity, trained on 4 GT + 5 round-2 pseudo tiles
if [ ! -d runs/p3_pseudo2/train/ckpt_9000 ] && [ -f runs/pseudo2/particles.json ]; then
  timeout 10800 python examples/powder_workflow.py --train --max-iter 9000 \
    --lr 4e-3 --batch 2 --flip both --jitter 0.2 \
    --rotate 0,15,-15,30,-30 --ema 0.999 \
    --crop 640 --min-sizes 512,576,640 \
    --pseudo runs/pseudo2/particles.json \
    --outdir runs/p3_pseudo2 > runs/logs/p3_pseudo2.log 2>&1
  commit_ckpt runs/p3_pseudo2/train ckpt_9000 \
    "Self-training round 2: 640-crop model on GT + ensemble pseudo-labels"
fi

# 4. evaluate: p3 base + TTA + vote, then the 4-model ensemble
P3=runs/p3_pseudo2/train/ckpt_9000
[ -d $P3 ] && timeout 3600 python $AP --ckpt $P3 --modes bf16 \
  --tta --tta-scales 704,800,896 --vote 0.5 \
  > runs/logs/eval_p3.log 2>&1
[ -d $P3 ] && timeout 7200 python $AP --ckpt $P3 --modes bf16 \
  --tta --tta-scales 704,800,896 --vote 0.5 --tta-only \
  --ensemble $P2,$T1,$P1 > runs/logs/eval_ens4.log 2>&1
commit_logs "Self-training round 2 + 4-model ensemble eval logs"

echo PHASE2_DONE
