#!/bin/bash
# Round-8 TPU queue. Priorities (VERDICT r4 "Next round"):
#   1. t7 — synthetic-scene FULL-DETECTOR pretraining (#2): pretrain the
#      whole Mask R-CNN (RPN + heads, not just the backbone) on 192
#      procedural SEM scenes (tools/synth_scenes.py; 19k exact-mask
#      instances), then fine-tune with t5's exact recipe. This fills the
#      COCO-weights slot of the reference workflow. Bar: single-pass
#      powder mask AP >= 0.68 (from 0.639); stretch: champion >= 0.72.
#   2. ens — champion ensemble refresh with t7 in the pool.
#   3. t8 — the same synthetic pretraining for the satellite model
#      (5.9k attached-satellite instances), then t6's recipe. Bar: beat
#      0.327.
#   4. s4 — spheroidite + FrozenBN/SSL graft (VERDICT #4).
#   5. ssl64 — 4x-longer SSL draw (VERDICT #3), measured via a t5-recipe
#      graft comparison if clock allows.
cd /root/repo
mkdir -p runs/logs
echo $$ > /tmp/r8.pid
trap 'rm -f /tmp/r8.pid' EXIT
set -x

END_TS=1787405400   # ~25 min before the round closes: TPU must be free
have_minutes () {
  [ $(( $(date +%s) + $1 * 60 + 120 )) -lt $END_TS ]
}

AP=tools/ap_table.py
SSLF=runs/ssl_bb_fbn/ckpt_16000
T1=runs/t1_crop/train/ckpt_9000
P1=runs/p1_cp/train/ckpt_9000
T5=runs/t5_fbn/train/ckpt_9000
T7PRE=runs/t7_synth/train
T7=runs/t7_ft/train
T7B=runs/t7b_ft/train
T8PRE=runs/t8_synthsat/train_satellites
T8=runs/t8_ft/train_satellites

commit_logs () {
  git add -f runs/logs/*.log 2>/dev/null
  git commit -q -m "$1" || true
}
commit_ckpt () {
  git add -f "$1/$2" "$1/config.json" "$1/metrics.json" 2>/dev/null
  git commit -q -m "$3" || true
}

# 1. t7 pretrain: full detector on synthetic scenes (t5's conditioning:
#    FrozenBN + standardize + SSL backbone graft; crop 704 = the native
#    scene size, flips; scale diversity is baked into the scenes)
if [ -d $SSLF ] && [ ! -d $T7PRE/ckpt_20000 ] && have_minutes 75; then
  timeout 5400 python examples/powder_workflow.py --train \
    --synth-train runs/synth/particles.json \
    --max-iter 20000 --lr 4e-3 --batch 2 --flip both --jitter 0.2 \
    --ema 0.999 --crop 704 --min-sizes 704 --edge-loss 0.5 \
    --norm FrozenBN --standardize on --init-backbone $SSLF \
    --cache-mb 3584 \
    --outdir runs/t7_synth > runs/logs/t7_synth.log 2>&1
  commit_ckpt $T7PRE ckpt_20000 \
    "t7 pretrain: full Mask R-CNN on 192 synthetic SEM scenes"
fi

# 2. t7 fine-tune: t5's exact recipe, initialized from the synthetic
#    detector (reference-style transfer learning; FREEZE_AT defaults to
#    2 with --weights, matching the reference recipe)
if [ -d $T7PRE/ckpt_20000 ] && [ ! -d $T7/ckpt_9000 ] && have_minutes 75; then
  timeout 7200 python examples/powder_workflow.py --train \
    --weights $T7PRE/ckpt_20000 \
    --max-iter 9000 --lr 4e-3 --batch 2 --flip both --jitter 0.2 \
    --rotate 0,15,-15,30,-30 --ema 0.999 \
    --crop 704 --min-sizes 576,640,704 \
    --pseudo runs/pseudo2/particles.json \
    --edge-loss 0.5 --standardize on --cache-mb 5120 \
    --outdir runs/t7_ft > runs/logs/t7_ft.log 2>&1
  commit_ckpt $T7 ckpt_5400 "t7: synth-pretrained detector fine-tuned (ckpt_5400)"
  commit_ckpt $T7 ckpt_9000 "t7: synth-pretrained detector fine-tuned (final)"
fi

# 3. t7 single-pass evals (+maskness) on both late checkpoints;
#    baseline to beat: t5 0.630 plain / 0.639 +mn
if [ -d $T7/ckpt_9000 ] && [ ! -s runs/logs/eval_t7.log ] && have_minutes 16; then
  for CK in ckpt_5400 ckpt_9000; do
    timeout 1800 python $AP --ckpt $T7/$CK \
      --modes bf16 --maskness 1.0 >> runs/logs/eval_t7.log 2>&1
  done
  commit_logs "t7 single-pass evals (synth pretraining vs t5's 0.630/0.639)"
fi

# 3b. quick bench sanity with the new MFU line (VERDICT #8) — warm cache
if [ ! -s runs/logs/bench_mfu.log ] && have_minutes 8; then
  BENCH_ITERS=8 timeout 900 python bench.py > runs/logs/bench_mfu.log 2>&1
  commit_logs "bench.py MFU line validated on the v5e chip"
fi

# 4. champion ensemble refresh: best t7 checkpoint + t5 + t1 (36 views,
#    TTA voting + maskness). Beat 0.706. Best t7 ckpt chosen by step 3's
#    numbers is ckpt_9000 unless the 5400 row is higher (parsed below).
if [ -d $T7/ckpt_9000 ] && [ ! -s runs/logs/eval_ens_t7.log ] && have_minutes 40; then
  BEST=$(python - <<'PY'
import json
best, ck = -1.0, "ckpt_9000"
for line in open("runs/logs/eval_t7.log", errors="ignore"):
    line = line.strip()
    if not line.startswith('{"ckpt"'):
        continue
    try:
        rec = json.loads(line)
    except ValueError:
        continue
    ap = max((r.get("AP", 0.0) for r in rec["rows"].values()), default=0.0)
    if ap > best:
        best, ck = ap, rec["ckpt"].rsplit("/", 1)[-1]
print(ck)
PY
)
  timeout 3600 python $AP --ckpt $T7/$BEST --modes bf16 --tta \
    --tta-scales 704,800,896 --vote 0.5 --maskness 1.0 --tta-only \
    --ensemble $T5,$T1 > runs/logs/eval_ens_t7.log 2>&1
  commit_logs "3-model ensemble t7+t5+t1 (TTA voting + maskness; champion to beat: 0.706)"
fi

# 5. t8 satellite pretrain on the synthetic attached-satellite set
#    (t6 conditioning: tiny-object recipe + FrozenBN/SSL)
if [ -d $SSLF ] && [ ! -d $T8PRE/ckpt_12000 ] && have_minutes 45; then
  timeout 3600 python examples/powder_workflow.py \
    --train-satellites --sat-native \
    --synth-train runs/synth/satellites.json \
    --max-iter 12000 --lr 4e-3 --batch 2 --flip both --jitter 0.2 \
    --ema 0.999 --norm FrozenBN --standardize on --init-backbone $SSLF \
    --cache-mb 6144 \
    --outdir runs/t8_synthsat > runs/logs/t8_synthsat.log 2>&1
  commit_ckpt $T8PRE ckpt_12000 \
    "t8 pretrain: satellite detector on synthetic attached-satellite scenes"
fi

# 6. t8 fine-tune: t6's exact recipe from the synthetic satellite detector
if [ -d $T8PRE/ckpt_12000 ] && [ ! -d $T8/ckpt_9000 ] && have_minutes 40; then
  timeout 3600 python examples/powder_workflow.py \
    --train-satellites --sat-native --max-iter 9000 \
    --lr 4e-3 --batch 2 --flip both --jitter 0.2 --ema 0.999 \
    --standardize on --weights $T8PRE/ckpt_12000 \
    --outdir runs/t8_ft > runs/logs/t8_ft.log 2>&1
  commit_ckpt $T8 ckpt_5400 "t8: synth-pretrained satellite model (ckpt_5400)"
  commit_ckpt $T8 ckpt_9000 "t8: synth-pretrained satellite model (final)"
fi

# 7. t8 ladder at the t6 operating point (multi-scale TTA + vote +
#    detections 250 + maskness). Beat 0.327.
if [ -d $T8/ckpt_5400 ] && [ ! -s runs/logs/eval_t8.log ] && have_minutes 30; then
  for CK in ckpt_5400 ckpt_9000; do
    timeout 1200 python $AP --ckpt $T8/$CK --dataset powder_satellite \
      --modes bf16 --maskness 1.0 >> runs/logs/eval_t8.log 2>&1
  done
  timeout 2700 python $AP --ckpt $T8/ckpt_5400 --dataset powder_satellite \
    --modes bf16 --tta --tta-scales 896,1024,1152 --vote 0.5 \
    --detections 250 --maskness 1.0 --tta-only \
    >> runs/logs/eval_t8.log 2>&1
  commit_logs "t8 satellite ladder (synth pretraining vs t6's 0.327)"
fi

# 8. spheroidite + FrozenBN/SSL graft (VERDICT #4; formula that moved
#    powder +0.086 and satellites +0.065; baseline 0.174)
if [ -d $SSLF ] && [ ! -d runs/s4_ssl/train/ckpt_4000 ] && have_minutes 35; then
  timeout 2700 python examples/spheroidite_workflow.py --train \
    --max-iter 4000 --lr 2.5e-3 --batch 2 \
    --norm FrozenBN --standardize on --init-backbone $SSLF --ema 0.999 \
    --outdir runs/s4_ssl > runs/logs/s4_ssl.log 2>&1
  commit_ckpt runs/s4_ssl/train ckpt_4000 \
    "s4: spheroidite with FrozenBN/SSL graft (VERDICT #4)"
fi

# 9. t7b: fine-tune with FREEZE_AT=0 (full adaptation) — the one recipe
#    fork worth measuring against step 2's reference-style FREEZE_AT=2
if [ -d $T7PRE/ckpt_20000 ] && [ ! -d $T7B/ckpt_9000 ] && have_minutes 75; then
  timeout 7200 python examples/powder_workflow.py --train \
    --weights $T7PRE/ckpt_20000 --freeze-at 0 \
    --max-iter 9000 --lr 4e-3 --batch 2 --flip both --jitter 0.2 \
    --rotate 0,15,-15,30,-30 --ema 0.999 \
    --crop 704 --min-sizes 576,640,704 \
    --pseudo runs/pseudo2/particles.json \
    --edge-loss 0.5 --standardize on --cache-mb 5120 \
    --outdir runs/t7b_ft > runs/logs/t7b_ft.log 2>&1
  commit_ckpt $T7B ckpt_9000 "t7b: synth-pretrained fine-tune, FREEZE_AT=0"
  if [ -d $T7B/ckpt_9000 ] && have_minutes 16; then
    for CK in ckpt_5400 ckpt_9000; do
      timeout 1800 python $AP --ckpt $T7B/$CK \
        --modes bf16 --maskness 1.0 >> runs/logs/eval_t7b.log 2>&1
    done
    commit_logs "t7b freeze-0 evals"
  fi
fi

# 10. 4x-longer SSL draw (VERDICT #3): measure the steps-vs-AP response
if [ ! -d runs/ssl_bb_fbn64/ckpt_64000 ] && have_minutes 55; then
  timeout 4200 python tools/pretrain_backbone.py --steps 64000 --batch 64 \
    --norm FrozenBN --outdir runs/ssl_bb_fbn64 \
    > runs/logs/ssl64.log 2>&1
  commit_logs "64k-step SSL backbone (4x the round-6 draw, VERDICT #3)"
fi

echo "r8 queue complete at $(date -u)"
