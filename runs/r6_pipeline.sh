#!/bin/bash
# Round-6 TPU queue. Theme: attack the diagnosed AP bottleneck with
# in-environment backbone pretraining (VERDICT r5 #1), produce the
# "fastest AND best" FrozenBN config (#7), and re-measure the champion.
#
# Stage gating is by artifact existence, so the script is re-runnable.
# Watcher pattern fixed per r5 advisor: the checkpoint watcher exits via
# a flag file and is wait-ed, never killed mid git-add; a stale
# index.lock is cleared (with the git pid gone) before final commits.
cd /root/repo
mkdir -p runs/logs
set -x

SSL=runs/ssl_bb/ckpt_16000
SSLF=runs/ssl_bb_fbn/ckpt_16000
P4=runs/p4_edge/train/ckpt_9000
T1=runs/t1_crop/train/ckpt_9000
P5=runs/p5_ssl/train/ckpt_9000
T5=runs/t5_fbn/train/ckpt_9000
AP=tools/ap_table.py

commit_logs () {
  git add -f runs/logs/*.log 2>/dev/null
  git commit -m "$1" || true
}
commit_ckpt () {
  git add -f "$1/$2" "$1/config.json" "$1/metrics.json" 2>/dev/null
  git commit -m "$3" || true
}

# 0. the GN SSL backbone (already launched in the foreground session;
#    wait for it, then commit the final checkpoint once)
for i in $(seq 1 120); do
  [ -d $SSL ] && break
  sleep 30
done
if [ -d $SSL ] && ! git ls-files --error-unmatch $SSL >/dev/null 2>&1; then
  git add -f $SSL runs/ssl_bb/pretrain_meta.json runs/logs/ssl_bb.log
  git commit -m "SSL-pretrained GN backbone (masked-patch recon, 16k steps on shipped SEM pool)" || true
fi

# 1. p5: the full best-recipe stack (p4's crop+edge+pseudo2) with the
#    SSL backbone graft as the single change vs p4 (0.628 plain)
if [ -d $SSL ] && [ ! -d $P5 ]; then
  timeout 10800 python examples/powder_workflow.py --train --max-iter 9000 \
    --lr 4e-3 --batch 2 --flip both --jitter 0.2 \
    --rotate 0,15,-15,30,-30 --ema 0.999 \
    --crop 704 --min-sizes 576,640,704 \
    --pseudo runs/pseudo2/particles.json \
    --edge-loss 0.5 \
    --init-backbone $SSL \
    --outdir runs/p5_ssl > runs/logs/p5_ssl.log 2>&1
  commit_ckpt runs/p5_ssl/train ckpt_9000 \
    "p5: best recipe + SSL-pretrained backbone graft (VERDICT r5 #1)"
fi

# 2. measure the SSL lever: single-pass + maskness (vs p4 0.628/0.634)
if [ -d $P5 ] && [ ! -s runs/logs/eval_p5_mn.log ]; then
  timeout 3600 python $AP --ckpt $P5 --modes bf16 \
    > runs/logs/eval_p5.log 2>&1
  timeout 2400 python $AP --ckpt $P5 --modes bf16 --maskness 1.0 \
    > runs/logs/eval_p5_mn.log 2>&1
  commit_logs "SSL-backbone lever measurement: p5 single-pass + maskness"
fi

# 3. FrozenBN SSL backbone for the fastest-AND-best config (#7):
#    int8-backbone inference needs FrozenBN (norm folds into the conv)
if [ ! -d $SSLF ]; then
  timeout 7200 python tools/pretrain_backbone.py --steps 16000 --batch 64 \
    --ckpt-every 4000 --norm FrozenBN --lr 5e-4 \
    --outdir runs/ssl_bb_fbn > runs/logs/ssl_bb_fbn.log 2>&1
  if [ -d $SSLF ]; then
    git add -f $SSLF runs/ssl_bb_fbn/pretrain_meta.json \
      runs/logs/ssl_bb_fbn.log
    git commit -m "SSL-pretrained FrozenBN backbone (for the int8 production config)" || true
  fi
fi

# 4. t5: FrozenBN + best recipe + SSL graft -> one config that is both
#    fastest (int8 backbone applies) and best-quality
if [ -d $SSLF ] && [ ! -d $T5 ]; then
  timeout 10800 python examples/powder_workflow.py --train --max-iter 9000 \
    --lr 4e-3 --batch 2 --flip both --jitter 0.2 \
    --rotate 0,15,-15,30,-30 --ema 0.999 \
    --crop 704 --min-sizes 576,640,704 \
    --pseudo runs/pseudo2/particles.json \
    --edge-loss 0.5 \
    --norm FrozenBN --standardize on \
    --init-backbone $SSLF \
    --outdir runs/t5_fbn > runs/logs/t5_fbn.log 2>&1
  commit_ckpt runs/t5_fbn/train ckpt_9000 \
    "t5: FrozenBN best-recipe model with SSL backbone (VERDICT r5 #7)"
fi

# 5. t5 quality across precisions (int8bb = the 141 img/s bench path)
if [ -d $T5 ] && [ ! -s runs/logs/eval_t5.log ]; then
  timeout 4800 python $AP --ckpt $T5 --modes bf16,int8,int8bb \
    --maskness 1.0 > runs/logs/eval_t5.log 2>&1
  commit_logs "t5 FrozenBN model: bf16/int8/int8bb quality (fast-and-best config)"
fi

# 6. advisor r5 item 1: eval the COMPOSED production config (int8 mask
#    head + cap 288 + maskness) on the p4 checkpoint it is quoted for
if [ -d $P4 ] && [ ! -s runs/logs/eval_p4_composed.log ]; then
  timeout 2400 python $AP --ckpt $P4 --modes int8 --mask-cap 288 \
    --maskness 1.0 > runs/logs/eval_p4_composed.log 2>&1
  commit_logs "Composed production config measured on p4 (advisor r5 item 1)"
fi

# 7. champion refresh: if p5 beats p4 single-pass, remeasure the
#    2-model ensemble with p5 in place of t1's partner
if [ -d $P5 ] && [ ! -s runs/logs/eval_ens2_p5.log ]; then
  timeout 7200 python $AP --ckpt $P5 --modes bf16 --tta \
    --tta-scales 704,800,896 --vote 0.5 --maskness 1.0 \
    --ensemble $T1 --tta-only > runs/logs/eval_ens2_p5.log 2>&1
  commit_logs "2-model ensemble with the SSL model (p5+t1, TTA voting + maskness)"
fi
echo R6_PIPELINE_DONE
