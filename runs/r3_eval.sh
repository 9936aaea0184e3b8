#!/bin/bash
# Post-retrain eval queue (runs after r3_pipeline.sh finishes):
# reproduce the docs/parity.md numbers on the retrained checkpoints,
# measure the self-training (pseudo-label) lever, the satellite sweep,
# and the mask-stage compaction bench. Everything logs under runs/logs/.
cd /root/repo
mkdir -p runs/logs
set -x

AP=tools/ap_table.py
T1=runs/t1_crop/train/ckpt_9000
P1=runs/p1_cp/train/ckpt_9000
P2=runs/p2_pseudo/train/ckpt_9000
SPH=runs/t3_sph/train/ckpt_4000

# 1. crop model: base + TTA + vote (expect ~0.620 / ~0.655)
[ -d $T1 ] && timeout 3600 python $AP --ckpt $T1 --modes bf16 \
  --tta --tta-scales 704,800,896 --vote 0.5 \
  > runs/logs/eval_t1.log 2>&1

# 2. full-frame model: base only (ensemble donor; expect ~0.599)
[ -d $P1 ] && timeout 3600 python $AP --ckpt $P1 --modes bf16 \
  > runs/logs/eval_p1.log 2>&1

# 3. two-model ensemble (expect ~0.671)
[ -d $T1 ] && [ -d $P1 ] && timeout 3600 python $AP --ckpt $T1 \
  --modes bf16 --tta --tta-scales 704,800,896 --vote 0.5 --tta-only \
  --ensemble $P1 > runs/logs/eval_ens2.log 2>&1

# 4. self-training model: base + TTA + vote (the unmeasured round-3 lever)
[ -d $P2 ] && timeout 3600 python $AP --ckpt $P2 --modes bf16 \
  --tta --tta-scales 704,800,896 --vote 0.5 \
  > runs/logs/eval_p2.log 2>&1

# 5. three-model ensemble around the self-trained base
[ -d $P2 ] && [ -d $T1 ] && timeout 5400 python $AP --ckpt $P2 \
  --modes bf16 --tta --tta-scales 704,800,896 --vote 0.5 --tta-only \
  --ensemble $T1,$P1 > runs/logs/eval_ens3.log 2>&1

# 6. satellite checkpoint sweep (expect best ~ckpt_5400 @ 0.155)
for c in 1800 3600 5400 7200 9000; do
  CK=runs/t2_sat/train_satellites/ckpt_$c
  [ -d $CK ] && timeout 2400 python $AP --ckpt $CK \
    --dataset powder_satellite --detections 150 --modes bf16 \
    > runs/logs/eval_sat_$c.log 2>&1
done

# 7. satellite best + multi-scale TTA + vote + detections 250 (expect ~0.249)
SB=runs/t2_sat/train_satellites/ckpt_5400
[ -d $SB ] && timeout 3600 python $AP --ckpt $SB \
  --dataset powder_satellite --detections 250 --modes bf16 \
  --tta --tta-scales 896,1024,1152 --vote 0.5 --tta-only \
  > runs/logs/eval_sat_tta.log 2>&1
# ... and with D4 rotation views (new: was never measured on satellites)
[ -d $SB ] && timeout 3600 python $AP --ckpt $SB \
  --dataset powder_satellite --detections 250 --modes bf16 \
  --tta --tta-scales 896,1024,1152 --vote 0.5 --tta-only --tta-rot \
  > runs/logs/eval_sat_tta_rot.log 2>&1

# 8. spheroidite (expect ~0.174)
[ -d $SPH ] && timeout 2400 python $AP --ckpt $SPH \
  --dataset spheroidite --modes bf16 > runs/logs/eval_sph.log 2>&1

# 9. mask-stage compaction: AP identity on the pinned bench checkpoint
timeout 2400 python $AP --ckpt powder_out_r2/train/ckpt_3600 \
  --modes bf16 > runs/logs/eval_cap0.log 2>&1
timeout 2400 python $AP --ckpt powder_out_r2/train/ckpt_3600 \
  --modes bf16 --mask-cap 288 > runs/logs/eval_cap288.log 2>&1

# 10. bench with compaction (vs the recorded 129.8 default)
timeout 3600 python bench.py > runs/logs/bench_default.log 2>&1
BENCH_MASK_CAP=288 timeout 3600 python bench.py > runs/logs/bench_cap288.log 2>&1

# 11. maskness rescoring sweep (SOLOv2-style, training-free): powder best
#     model base + TTA, and the satellite TTA config that sits at 0.249.
for a in 0.5 1.0; do
  [ -d $T1 ] && timeout 2400 python $AP --ckpt $T1 --modes bf16 \
    --maskness $a > runs/logs/eval_t1_maskness_$a.log 2>&1
done
[ -d $T1 ] && timeout 3600 python $AP --ckpt $T1 --modes bf16 \
  --tta --tta-scales 704,800,896 --vote 0.5 --tta-only --maskness 0.5 \
  > runs/logs/eval_t1_tta_maskness.log 2>&1
SB=runs/t2_sat/train_satellites/ckpt_5400
[ -d $SB ] && timeout 3600 python $AP --ckpt $SB \
  --dataset powder_satellite --detections 250 --modes bf16 \
  --tta --tta-scales 896,1024,1152 --vote 0.5 --tta-only --maskness 0.5 \
  > runs/logs/eval_sat_tta_maskness.log 2>&1

echo EVAL_DONE
