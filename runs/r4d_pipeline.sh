#!/bin/bash
# Round-4 final takeover: guarantee BOTH lever measurements land with
# evals before the round ends — p4 edge-agreement (VERDICT Weak #1) and
# d1 ensemble-distillation (VERDICT Missing #2) — at the cost of the
# optional sweeps (cap-256 point, ens5, d1-TTA, s2_edge, mask-res pair),
# which stay scripted in runs/r4c_pipeline.sh for round 5.
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

# 0. cap-288 AP-neutrality on the best single-pass checkpoint (second
#    norm family / higher-AP confirmation of the new bench default)
[ ! -s runs/logs/eval_p2_cap288.log ] && timeout 1800 python $AP \
  --ckpt $P2 --modes bf16 --mask-cap 288 \
  > runs/logs/eval_p2_cap288.log 2>&1
commit_logs "Mask-cap 288 AP check on the best single-pass checkpoint"

# 1. edge-agreement model (exact p2 protocol + --edge-loss 0.5)
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

# 2. the lever measurement (p2's same rows: 0.624 plain / 0.632 mn1.0)
[ -d $P4 ] && timeout 3600 python $AP --ckpt $P4 --modes bf16 \
  > runs/logs/eval_p4.log 2>&1
[ -d $P4 ] && timeout 3600 python $AP --ckpt $P4 --modes bf16 \
  --maskness 1.0 > runs/logs/eval_p4_mn.log 2>&1
commit_logs "Edge-agreement lever measurement (powder, single-pass)"

# 3. round-3 pseudo-labels from the strongest labeler measured this
#    round (4-model TTA-voted ensemble + maskness = 0.692)
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

# 4. distilled single-pass model: p2's exact recipe and schedule on the
#    denser/better labels (9000 iters so the p2/p3/p4 rows read directly)
if [ ! -d runs/d1_distill/train/ckpt_9000 ] && [ -f runs/pseudo3/particles.json ]; then
  timeout 10800 python examples/powder_workflow.py --train --max-iter 9000 \
    --lr 4e-3 --batch 2 --flip both --jitter 0.2 \
    --rotate 0,15,-15,30,-30 --ema 0.999 \
    --crop 704 --min-sizes 576,640,704 \
    --pseudo runs/pseudo3/particles.json \
    --outdir runs/d1_distill > runs/logs/d1_distill.log 2>&1
  commit_ckpt runs/d1_distill/train ckpt_9000 \
    "Distilled single-pass model: p2 recipe on GT + 4-model-ensemble labels"
fi

# 5. its single-pass measurement (the production artifact row)
D1=runs/d1_distill/train/ckpt_9000
[ -d $D1 ] && timeout 3600 python $AP --ckpt $D1 --modes bf16 \
  > runs/logs/eval_d1.log 2>&1
[ -d $D1 ] && timeout 3600 python $AP --ckpt $D1 --modes bf16 \
  --maskness 1.0 > runs/logs/eval_d1_mn.log 2>&1
commit_logs "Distilled model eval: single-pass (plain + maskness)"

# 6. leftovers, in value order, while the round is alive
bash runs/r4c_pipeline.sh > runs/logs/r4c_pipeline.log 2>&1

echo R4D_PIPELINE_DONE
