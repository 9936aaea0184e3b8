#!/bin/bash
# Round-7 follow-up: the refreshed two-model pipeline row (VERDICT r5
# #2's second half) — particle production model (t5) + the new
# FrozenBN/SSL satellite model (t6, AP 0.327 with TTA ladder) through
# the full matching pipeline + physical measurements.
# p5b and s4 were clock-gated out in favor of this (sentinel dirs;
# see runs/logs/eval_p5b.log / eval_s4.log notes).
cd /root/repo
set -x
# wait for the r7 queue to release the TPU
while kill -0 "$(cat /tmp/r7.pid 2>/dev/null)" 2>/dev/null; do sleep 20; done

END_TS=1787366700
have_minutes () {
  [ $(( $(date +%s) + $1 * 60 + 120 )) -lt $END_TS ]
}

if [ ! -s runs/logs/pipe_t6.log ] && have_minutes 12; then
  timeout 1500 python examples/powder_workflow.py \
    --weights runs/t5_fbn/train/ckpt_9000 \
    --satellite-weights runs/t6_sat/train_satellites/ckpt_5400 \
    --outdir runs/pipe_t6 > runs/logs/pipe_t6.log 2>&1
  git add -f runs/logs/*.log
  git commit -m "Two-model pipeline row refreshed with the FrozenBN/SSL satellite model" || true
fi
echo R7B_DONE
