#!/bin/bash
# Round-6 last queue (after r6final): the short-schedule SSL fine-tune
# and the spheroidite SSL transfer, budget-gated.
cd /root/repo
mkdir -p runs/logs
set -x

END_TS=1787361000
have_minutes () {
  [ $(( $(date +%s) + $1 * 60 + 120 )) -lt $END_TS ]
}

AP=tools/ap_table.py
SSL=runs/ssl_bb/ckpt_16000
SSLF=runs/ssl_bb_fbn/ckpt_16000
P5B=runs/p5b_short/train/ckpt_6000
S4=runs/s4_ssl/train/ckpt_4000

commit_logs () {
  git add -f runs/logs/*.log 2>/dev/null
  git commit -m "$1" || true
}
commit_ckpt () {
  git add -f "$1/$2" "$1/config.json" "$1/metrics.json" 2>/dev/null
  git commit -m "$3" || true
}

# 1. p5b: t5's winning combo on a 6000-iter schedule — FrozenBN + SSL
#    (the family where SSL is worth +0.09) with decay at 4200/5400
if [ -d $SSLF ] && [ ! -d $P5B ] && have_minutes 85; then
  timeout 7200 python examples/powder_workflow.py --train --max-iter 6000 \
    --lr 4e-3 --batch 2 --flip both --jitter 0.2 \
    --rotate 0,15,-15,30,-30 --ema 0.999 \
    --crop 704 --min-sizes 576,640,704 \
    --pseudo runs/pseudo2/particles.json \
    --edge-loss 0.5 \
    --norm FrozenBN --standardize on \
    --init-backbone $SSLF \
    --outdir runs/p5b_short > runs/logs/p5b_short.log 2>&1
  commit_ckpt runs/p5b_short/train ckpt_6000 \
    "p5b: FrozenBN+SSL on a 6000-iter schedule"
fi
if [ -d $P5B ] && [ ! -s runs/logs/eval_p5b.log ] && have_minutes 15; then
  timeout 3600 python $AP --ckpt $P5B --modes bf16 --maskness 1.0 \
    > runs/logs/eval_p5b.log 2>&1
  commit_logs "p5b short-schedule eval (vs t5 0.639)"
fi

# 2. spheroidite + SSL backbone (transfer beyond powder)
if [ -d $SSL ] && [ ! -d $S4 ] && have_minutes 45; then
  timeout 7200 python examples/spheroidite_workflow.py --train \
    --max-iter 4000 --lr 2.5e-3 --batch 2 \
    --init-backbone $SSL \
    --outdir runs/s4_ssl > runs/logs/s4_ssl.log 2>&1
  commit_ckpt runs/s4_ssl/train ckpt_4000 \
    "s4: spheroidite model with SSL backbone graft"
fi
if [ -d $S4 ] && [ ! -s runs/logs/eval_s4.log ] && have_minutes 12; then
  timeout 2400 python $AP --ckpt $S4 --dataset spheroidite --modes bf16 \
    > runs/logs/eval_s4.log 2>&1
  commit_logs "Spheroidite SSL-backbone model eval (vs 0.174 from-scratch)"
fi
echo R6LAST_DONE
