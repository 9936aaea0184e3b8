#!/bin/bash
# Round-4 TPU queue, in VERDICT.md priority order:
#   A. finish round-3 phase 2 (eval the p3 self-training-round-2 model,
#      4-model ensemble) — VERDICT Missing #1
#   B. maskness alpha sweep on the best single model + cheap benches
#      (bf16-only with the new cap-288 default; cap 256 point;
#      AP-neutrality of cap 288 on the best checkpoint) — VERDICT Weak #2/#3
#   C. distill the ensemble into ONE single-pass model: pseudo-label with
#      the 4-model TTA-voted ensemble (+maskness), retrain the p2 recipe
#      on GT + dense ensemble labels, eval single-pass — VERDICT Missing #2
#   D. round-3 phase 3: edge-agreement model + 5-model ensemble +
#      spheroidite edge run — VERDICT Weak #1
#   E. satellite precision levers (maskness alphas, rot TTA) — VERDICT #6
#   F. spheroidite self-training — VERDICT #7
#   G. mask-res 56 paired measurement — VERDICT #3
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
P3=runs/p3_pseudo2/train/ckpt_9000
P4=runs/p4_edge/train/ckpt_9000
SB=runs/t2_sat/train_satellites/ckpt_5400

# ---------- A. finish round-3 phase 2 ----------
# A1. p3 (self-training round 2, 640-crop) base + TTA
[ -d $P3 ] && [ ! -s runs/logs/eval_p3.log ] && timeout 3600 \
  python $AP --ckpt $P3 --modes bf16 \
  --tta --tta-scales 704,800,896 --vote 0.5 \
  > runs/logs/eval_p3.log 2>&1
commit_logs "Self-training round 2 eval: p3 base + TTA"

# A2. 4-model ensemble, plain (comparable to ens2/ens3 ladder rows) and
#     with maskness 1.0 (t1's best TTA config, eval_t1_tta_maskness 0.687)
[ -d $P3 ] && [ ! -s runs/logs/eval_ens4.log ] && timeout 7200 \
  python $AP --ckpt $P3 --modes bf16 \
  --tta --tta-scales 704,800,896 --vote 0.5 --tta-only \
  --ensemble $P2,$T1,$P1 > runs/logs/eval_ens4.log 2>&1
[ -d $P3 ] && timeout 7200 python $AP --ckpt $P3 --modes bf16 \
  --tta --tta-scales 704,800,896 --vote 0.5 --tta-only --maskness 1.0 \
  --ensemble $P2,$T1,$P1 > runs/logs/eval_ens4_mn.log 2>&1
commit_logs "4-model ensemble eval (plain + maskness)"

# ---------- B. maskness sweep + benches ----------
# B1. maskness alpha on the best single-pass model (p2, base 0.624):
#     t1 showed 1.0 > 0.5 > 0 and was still rising at 1.0
for a in 1.0 2.0; do
  timeout 1800 python $AP --ckpt $P2 --modes bf16 --maskness $a \
    > runs/logs/eval_p2_mn_$a.log 2>&1
done
timeout 3600 python $AP --ckpt $P2 --modes bf16 --maskness 1.0 \
  --tta --tta-scales 704,800,896 --vote 0.5 --tta-only \
  > runs/logs/eval_p2_tta_mn.log 2>&1
commit_logs "Maskness alpha sweep on p2 (base + TTA)"

# B2. benches: pure-bf16 with the new cap-288 default (VERDICT #5: lift
#     bf16 over 5x = 116.5 img/s), one cap-256 point, and the cap-288
#     AP-neutrality check on the best checkpoint (p2)
BENCH_INT8=0 BENCH_INT8_BB=0 timeout 2400 python bench.py \
  > runs/logs/bench_bf16_cap288.log 2>&1
BENCH_MASK_CAP=256 timeout 2400 python bench.py \
  > runs/logs/bench_cap256.log 2>&1
timeout 1800 python $AP --ckpt $P2 --modes bf16 --mask-cap 288 \
  > runs/logs/eval_p2_cap288.log 2>&1
commit_logs "Mask-cap 288 default: bf16 bench, cap-256 point, p2 AP check"

# ---------- C. distillation ----------
# C1. round-3 pseudo-labels: 4-model TTA-voted ensemble + maskness —
#     the strongest labeler available (48 views)
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

# C2. distilled single-pass model: p2's exact recipe, longer schedule,
#     denser/better labels
if [ ! -d runs/d1_distill/train/ckpt_12000 ] && [ -f runs/pseudo3/particles.json ]; then
  timeout 10800 python examples/powder_workflow.py --train --max-iter 12000 \
    --lr 4e-3 --batch 2 --flip both --jitter 0.2 \
    --rotate 0,15,-15,30,-30 --ema 0.999 \
    --crop 704 --min-sizes 576,640,704 \
    --pseudo runs/pseudo3/particles.json \
    --outdir runs/d1_distill > runs/logs/d1_distill.log 2>&1
  commit_ckpt runs/d1_distill/train ckpt_12000 \
    "Distilled single-pass model: p2 recipe x12000 iters on GT + 4-model-ensemble labels"
fi

# C3. evaluate the distilled model: single-pass plain, single-pass +
#     maskness (the production config), and TTA for the ladder
D1=runs/d1_distill/train/ckpt_12000
[ -d $D1 ] && timeout 3600 python $AP --ckpt $D1 --modes bf16 \
  > runs/logs/eval_d1.log 2>&1
[ -d $D1 ] && timeout 3600 python $AP --ckpt $D1 --modes bf16 --maskness 1.0 \
  --tta --tta-scales 704,800,896 --vote 0.5 \
  > runs/logs/eval_d1_mn.log 2>&1
commit_logs "Distilled model eval: single-pass + maskness + TTA"

# ---------- D. round-3 phase 3 (edge-agreement) ----------
# D1. edge-agreement model: crop-704 recipe on GT + round-2 pseudo tiles
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

# D2. evaluate it (same protocol as p2/p3 so the edge-loss delta is clean)
[ -d $P4 ] && timeout 3600 python $AP --ckpt $P4 --modes bf16 \
  --tta --tta-scales 704,800,896 --vote 0.5 \
  > runs/logs/eval_p4.log 2>&1
commit_logs "Edge-agreement lever measurement (powder)"

# D3. 5-model ensemble (60 views) + maskness
if [ -d $P4 ] && [ -d $P3 ]; then
  timeout 9000 python $AP --ckpt $P2 --modes bf16 \
    --tta --tta-scales 704,800,896 --vote 0.5 --tta-only --maskness 1.0 \
    --ensemble $T1,$P1,$P3,$P4 > runs/logs/eval_ens5.log 2>&1
  commit_logs "5-model ensemble eval (maskness)"
fi

# ---------- E. satellite precision levers ----------
for a in 1.0 2.0; do
  timeout 3600 python $AP --ckpt $SB \
    --dataset powder_satellite --detections 250 --modes bf16 \
    --tta --tta-scales 896,1024,1152 --vote 0.5 --tta-only --maskness $a \
    > runs/logs/eval_sat_mn_$a.log 2>&1
done
timeout 4800 python $AP --ckpt $SB \
  --dataset powder_satellite --detections 250 --modes bf16 \
  --tta --tta-scales 896,1024,1152 --vote 0.5 --tta-only --tta-rot \
  --maskness 1.0 > runs/logs/eval_sat_rot_mn.log 2>&1
commit_logs "Satellite maskness/rotation sweeps"

# ---------- F. spheroidite: edge loss + self-training ----------
S1=runs/t3_sph/train/ckpt_4000
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

# F2. spheroidite self-distillation: no unlabeled spheroidite images
# exist (all 10 shipped images are annotated), so re-label the 8 train
# images with the TTA-voted maskness-rescored predictor and train on
# GT + the dense self-labels (gated on --pseudo support in the workflow)
if grep -q "pseudo" examples/spheroidite_workflow.py && [ -d $S1 ]; then
  if [ ! -f runs/sph_pseudo/spheroidite.json ]; then
    timeout 3600 python tools/pseudo_label.py --ckpt $S1 \
      --images /root/reference/examples/spheroidite/data/images \
      --exclude valid_ \
      --out runs/sph_pseudo/spheroidite.json --score-thresh 0.7 \
      --tta --vote 0.5 --maskness 1.0 \
      > runs/logs/sph_pseudo.log 2>&1
    git add -f runs/sph_pseudo/spheroidite.json && \
      git commit -m "Spheroidite pseudo-labels (TTA-voted, maskness-rescored)" || true
  fi
  if [ -f runs/sph_pseudo/spheroidite.json ] && [ ! -d runs/s3_pseudo/train/ckpt_4000 ]; then
    timeout 10800 python examples/spheroidite_workflow.py --train \
      --max-iter 4000 --lr 2.5e-3 --batch 2 \
      --pseudo runs/sph_pseudo/spheroidite.json \
      --outdir runs/s3_pseudo > runs/logs/s3_pseudo.log 2>&1
    commit_ckpt runs/s3_pseudo/train ckpt_4000 \
      "Spheroidite self-training model"
  fi
  [ -d runs/s3_pseudo/train/ckpt_4000 ] && timeout 2400 python $AP \
    --ckpt runs/s3_pseudo/train/ckpt_4000 --dataset spheroidite \
    --modes bf16 > runs/logs/eval_s3_pseudo.log 2>&1
  commit_logs "Spheroidite self-training measurement"
fi

# ---------- G. mask-res 56 paired measurement ----------
# Two runs identical except --mask-res (3000 iters, t1's crop recipe,
# no pseudo): a controlled quality + throughput comparison.
for MR in 28 56; do
  if [ ! -d runs/m$MR/train/ckpt_3000 ]; then
    timeout 7200 python examples/powder_workflow.py --train --max-iter 3000 \
      --lr 4e-3 --batch 2 --flip both --jitter 0.2 \
      --rotate 0,15,-15,30,-30 --ema 0.999 \
      --crop 704 --min-sizes 576,640,704 \
      --mask-res $MR \
      --outdir runs/m$MR > runs/logs/m$MR.log 2>&1
    commit_ckpt runs/m$MR/train ckpt_3000 \
      "Mask-res paired run: $MR x 3000 iters (controlled comparison)"
  fi
  [ -d runs/m$MR/train/ckpt_3000 ] && timeout 2400 python $AP \
    --ckpt runs/m$MR/train/ckpt_3000 --modes bf16 \
    > runs/logs/eval_m$MR.log 2>&1
done
commit_logs "Mask-res 28 vs 56 paired measurement"
# throughput cost of the 56 head on the bench workload
[ -d runs/m56/train/ckpt_3000 ] && \
  BENCH_WEIGHTS=runs/m56/train/ckpt_3000 BENCH_INT8=0 BENCH_INT8_BB=0 \
  timeout 2400 python bench.py > runs/logs/bench_m56.log 2>&1
[ -d runs/m28/train/ckpt_3000 ] && \
  BENCH_WEIGHTS=runs/m28/train/ckpt_3000 BENCH_INT8=0 BENCH_INT8_BB=0 \
  timeout 2400 python bench.py > runs/logs/bench_m28.log 2>&1
commit_logs "Mask-res 56 bench cost"

echo R4_PIPELINE_DONE
