#!/bin/bash
# Round-4 follow-on queue (launched after runs/r4_pipeline.sh finishes):
# production-config bench rows and the best-ladder refinements that the
# main queue's results justify.
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

# 1. int8 mask head + cap-288 (no int8 backbone): the production config
#    for GN checkpoints (the best-AP from-scratch models), which the
#    FrozenBN-only int8 backbone folding refuses
BENCH_INT8_BB=0 timeout 2400 python bench.py \
  > runs/logs/bench_int8mh_cap288.log 2>&1
commit_logs "Bench: int8 mask head + cap288 (GN-checkpoint production config)"

# 2. the 2-model ensemble (best plain ensemble, 0.673) with maskness —
#    t1+TTA+mn alone hit 0.687; recalibrated votes may stack with
#    ensemble diversity
timeout 7200 python $AP --ckpt $T1 --modes bf16 \
  --tta --tta-scales 704,800,896 --vote 0.5 --tta-only --maskness 1.0 \
  --ensemble $P1 > runs/logs/eval_ens2_mn.log 2>&1
commit_logs "2-model ensemble + maskness"

# 3. satellite self-distillation: re-label the 8 train tiles + the one
#    satellite-unlabeled tile (Sc1Tile_001-005) with the best TTA-voted
#    maskness config, retrain the tiny-object recipe on GT + self-labels
if [ ! -f runs/sat_pseudo/satellites.json ]; then
  timeout 7200 python tools/pseudo_label.py --ckpt $SB \
    --images /root/reference/examples/powder/data/images_png \
    --exclude Sc2Tile_010-006,Sc3Tile_010-001 \
    --out runs/sat_pseudo/satellites.json --score-thresh 0.7 \
    --detections 250 \
    --tta --tta-scales 896,1024,1152 --vote 0.5 --maskness 0.5 \
    > runs/logs/sat_pseudo.log 2>&1
  git add -f runs/sat_pseudo/satellites.json && \
    git commit -m "Satellite pseudo/self-labels (TTA-voted, maskness-rescored)" || true
fi
if [ -f runs/sat_pseudo/satellites.json ] && [ ! -d runs/sat2/train_satellites/ckpt_9000 ]; then
  timeout 10800 python examples/powder_workflow.py \
    --weights runs/t1_crop/train/ckpt_9000 \
    --train-satellites --sat-native --max-iter 9000 \
    --lr 4e-3 --batch 2 --flip both --jitter 0.2 --ema 0.999 \
    --sat-pseudo runs/sat_pseudo/satellites.json \
    --outdir runs/sat2 > runs/logs/sat2.log 2>&1
  commit_ckpt runs/sat2/train_satellites ckpt_5400 \
    "Satellite self-training: tiny-object recipe + self-labels (ckpt_5400)"
  commit_ckpt runs/sat2/train_satellites ckpt_9000 \
    "Satellite self-training: final checkpoint"
fi
for CK in ckpt_5400 ckpt_9000; do
  [ -d runs/sat2/train_satellites/$CK ] && timeout 3600 python $AP \
    --ckpt runs/sat2/train_satellites/$CK \
    --dataset powder_satellite --detections 250 --modes bf16 \
    --tta --tta-scales 896,1024,1152 --vote 0.5 --maskness 0.5 \
    > runs/logs/eval_sat2_$CK.log 2>&1
done
commit_logs "Satellite self-training measurement"

echo R4B_PIPELINE_DONE
