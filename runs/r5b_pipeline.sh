#!/bin/bash
# Round-5 extras, run only after runs/r5_pipeline.sh prints
# R5_PIPELINE_DONE (single TPU client at a time). Cheap perf rows:
# batch scaling on the pure-bf16 + compaction config (VERDICT #5
# candidates list: "compaction, batch 64, pool-issue reduction" —
# compaction is measured; this measures batch 64).
cd /root/repo
mkdir -p runs/logs
set -x

[ -f /tmp/round_end_ts ] || echo 1787277238 > /tmp/round_end_ts
have_minutes () {
  [ $(( $(date +%s) + $1 * 60 + 180 )) -lt "$(cat /tmp/round_end_ts)" ]
}

commit_logs () {
  git add -f runs/logs/*.log 2>/dev/null
  git commit -m "$1" || true
}

if have_minutes 12 && ! grep -q '"metric"' runs/logs/bench_bf16_b64.log 2>/dev/null; then
  BENCH_INT8=0 BENCH_INT8_BB=0 BENCH_BATCH=64 timeout 2400 python bench.py \
    > runs/logs/bench_bf16_b64.log 2>&1
  commit_logs "Bench: pure-bf16 + cap288 at batch 64"
fi

# 56-res mask head throughput: batch 32 OOMs the fused pooler's scoped
# VMEM (runs/logs/bench_maskres56.log); batch 16 for the record.
if have_minutes 12 && ! grep -q '"metric"' runs/logs/bench_maskres56_b16.log 2>/dev/null; then
  BENCH_MASK_RES=56 BENCH_INT8=0 BENCH_INT8_BB=0 BENCH_BATCH=16 \
    timeout 2400 python bench.py > runs/logs/bench_maskres56_b16.log 2>&1
  commit_logs "Bench: 56x56 mask head at batch 16 (batch 32 exceeds pooler VMEM)"
fi

if have_minutes 12 && ! grep -q '"metric"' runs/logs/bench_b64.log 2>/dev/null; then
  BENCH_BATCH=64 timeout 2400 python bench.py \
    > runs/logs/bench_b64.log 2>&1
  commit_logs "Bench: production int8+cap288 config at batch 64"
fi

echo R5B_PIPELINE_DONE
