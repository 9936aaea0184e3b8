#!/bin/bash
# Round-3 recovery pipeline: retrain the models whose checkpoints were lost
# in the environment reset, committing each final checkpoint (runs/ is
# gitignored, so add -f) so a future reset cannot destroy them again.
# Recipes are the ones recorded in docs/parity.md.
cd /root/repo
mkdir -p runs/logs
set -x

commit_ckpt () {  # $1 = train dir, $2 = ckpt name, $3 = message
  git add -f "$1/$2" "$1/config.json" "$1/metrics.json" 2>/dev/null
  git commit -m "$3" || true
}

# 1. crop-trained powder particle model (parity.md: 0.620 base / 0.649 TTA)
if [ ! -d runs/t1_crop/train/ckpt_9000 ]; then
  timeout 10800 python examples/powder_workflow.py --train --max-iter 9000 \
    --lr 4e-3 --batch 2 --flip both --jitter 0.2 \
    --rotate 0,15,-15,30,-30 --ema 0.999 \
    --crop 704 --min-sizes 576,640,704 \
    --outdir runs/t1_crop > runs/logs/t1_crop.log 2>&1
  commit_ckpt runs/t1_crop/train ckpt_9000 \
    "Retrain crop-recipe powder model (checkpoint committed: reset-proof)"
fi

# 2. full-frame rotation+copy-paste model (parity.md: 0.599 base, ensemble donor)
if [ ! -d runs/p1_cp/train/ckpt_9000 ]; then
  timeout 10800 python examples/powder_workflow.py --train --max-iter 9000 \
    --lr 4e-3 --batch 2 --flip both --jitter 0.2 \
    --rotate 0,15,-15,30,-30 --ema 0.999 --copy-paste 0.5 \
    --outdir runs/p1_cp > runs/logs/p1_cp.log 2>&1
  commit_ckpt runs/p1_cp/train ckpt_9000 \
    "Retrain full-frame copy-paste powder model (ensemble donor, committed)"
fi

# 3. pseudo-label the 5 unlabeled tiles with the two-model TTA ensemble
#    (excludes BOTH validation images: particle val Sc2Tile_010-006 and
#    satellite val Sc3Tile_010-001)
if [ ! -f runs/pseudo/particles.json ]; then
  timeout 7200 python tools/pseudo_label.py \
    --ckpt runs/t1_crop/train/ckpt_9000 \
    --images /root/reference/examples/powder/data/images_png \
    --exclude Sc1Tile_001-001,Sc1Tile_001-002,Sc2Tile_001-001,Sc3Tile_008-007,Sc2Tile_010-006,Sc3Tile_010-001 \
    --out runs/pseudo/particles.json --score-thresh 0.7 \
    --tta --tta-scales 704,800,896 --vote 0.5 \
    --ensemble runs/p1_cp/train/ckpt_9000 \
    > runs/logs/pseudo.log 2>&1
  git add -f runs/pseudo/particles.json && \
    git commit -m "Pseudo-labels for the 5 unlabeled powder tiles (ensemble TTA, score>=0.7)" || true
fi

# 4. self-training: crop recipe + pseudo pool (the unmeasured round-3 lever)
if [ ! -d runs/p2_pseudo/train/ckpt_9000 ]; then
  timeout 10800 python examples/powder_workflow.py --train --max-iter 9000 \
    --lr 4e-3 --batch 2 --flip both --jitter 0.2 \
    --rotate 0,15,-15,30,-30 --ema 0.999 \
    --crop 704 --min-sizes 576,640,704 \
    --pseudo runs/pseudo/particles.json \
    --outdir runs/p2_pseudo > runs/logs/p2_pseudo.log 2>&1
  commit_ckpt runs/p2_pseudo/train ckpt_9000 \
    "Self-training: crop recipe + 5 pseudo-labeled tiles (checkpoint committed)"
fi

# 5. satellite tiny-object model (parity.md: 0.155 base / 0.249 TTA+vote)
if [ ! -d runs/t2_sat/train_satellites/ckpt_9000 ]; then
  timeout 10800 python examples/powder_workflow.py \
    --weights runs/t1_crop/train/ckpt_9000 \
    --train-satellites --sat-native --max-iter 9000 \
    --lr 4e-3 --batch 2 --flip both --jitter 0.2 --ema 0.999 \
    --outdir runs/t2_sat > runs/logs/t2_sat.log 2>&1
  commit_ckpt runs/t2_sat/train_satellites ckpt_5400 "Retrain satellite tiny-object model: ckpt_5400 (parity.md sweep best)"
  commit_ckpt runs/t2_sat/train_satellites ckpt_9000 "Retrain satellite tiny-object model: final checkpoint"
fi

# 6. spheroidite from-scratch model (parity.md: 0.174)
if [ ! -d runs/t3_sph/train/ckpt_4000 ]; then
  timeout 10800 python examples/spheroidite_workflow.py --train \
    --max-iter 4000 --lr 2.5e-3 --batch 2 \
    --outdir runs/t3_sph > runs/logs/t3_sph.log 2>&1
  commit_ckpt runs/t3_sph/train ckpt_4000 \
    "Retrain spheroidite from-scratch model (checkpoint committed)"
fi

echo PIPELINE_DONE
