#!/bin/bash
# Round-6 third queue (runs after r6b): spheroidite with the SSL
# backbone (the round-5 self-distillation ask was clock-bound; the SSL
# init is the cleaner lever and tests the pretraining's transfer beyond
# powder), plus the s2_edge retry that died on a transient tunnel error.
cd /root/repo
mkdir -p runs/logs
set -x

SSL=runs/ssl_bb/ckpt_16000
S4=runs/s4_ssl/train/ckpt_4000
AP=tools/ap_table.py

commit_logs () {
  git add -f runs/logs/*.log 2>/dev/null
  git commit -m "$1" || true
}
commit_ckpt () {
  git add -f "$1/$2" "$1/config.json" "$1/metrics.json" 2>/dev/null
  git commit -m "$3" || true
}

# 0. p5 mid-checkpoint sweep: validation loss bottomed at iter 5399
#    (1.768 vs p4's 1.843 best) then overfit (2.014 at 9000) — the SSL
#    init wants a shorter schedule; measure the mid checkpoints
if [ -d runs/p5_ssl/train/ckpt_5400 ] && \
   [ ! -s runs/logs/eval_p5_mid.log ]; then
  for CK in ckpt_5400 ckpt_7200; do
    timeout 3600 python $AP --ckpt runs/p5_ssl/train/$CK --modes bf16 \
      --maskness 1.0 >> runs/logs/eval_p5_mid.log 2>&1
  done
  commit_logs "p5 mid-checkpoint sweep (val-loss minimum at 5400)"
fi

# 1. spheroidite + SSL backbone (t3_sph recipe, single change = init)
if [ -d $SSL ] && [ ! -d $S4 ]; then
  timeout 7200 python examples/spheroidite_workflow.py --train \
    --max-iter 4000 --lr 2.5e-3 --batch 2 \
    --init-backbone $SSL \
    --outdir runs/s4_ssl > runs/logs/s4_ssl.log 2>&1
  commit_ckpt runs/s4_ssl/train ckpt_4000 \
    "s4: spheroidite model with SSL backbone graft"
fi
if [ -d $S4 ] && [ ! -s runs/logs/eval_s4.log ]; then
  timeout 2400 python $AP --ckpt $S4 --dataset spheroidite --modes bf16 \
    > runs/logs/eval_s4.log 2>&1
  commit_logs "Spheroidite SSL-backbone model eval (vs 0.174 from-scratch)"
fi
echo R6C_PIPELINE_DONE
