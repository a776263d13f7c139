#!/bin/bash
# Round-3 session-2 final plan.  Two TPU worker crashes this session, both
# in the SEMANTIC fly-embed paths (benchmark_semantic at n=24x5s, then
# quality --watermark semantic_cluster at 64x5s after the 2ccd79d
# sub-batched fori_loop chain landed): the worker dies with "kernel fault"
# and takes ~15 min to come back.  So: NO semantic TPU stages this
# session.  Run the known-good robustness sweeps until the deadline, then
# stop so the driver's bench.py gets a free chip.
#
# Usage: run_showcase_staged5.sh <deadline-epoch-seconds>
set -u
cd /root/repo
LOG=/tmp/showcase_staged.log
DEADLINE=${1:?deadline epoch}

left() { echo $(( DEADLINE - $(date +%s) )); }

probe() {
  timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
print('probe ok', float(np.asarray(jnp.ones((8,128))).sum()))" >> "$LOG" 2>&1
}

echo "=== staged5: waiting for TPU worker $(date -u +%H:%M:%S) ===" >> "$LOG"
until probe; do
  [ "$(left)" -lt 120 ] && { echo "=== staged5: deadline before recovery ===" >> "$LOG"; exit 0; }
  sleep 30
done
echo "=== staged5: TPU back $(date -u +%H:%M:%S) ===" >> "$LOG"

stage() {
  # returns the command's rc (ADVICE r3: a failed sweep must not feed its
  # partial CSV into the chained stats stage); deadline skips return 99
  name=$1; shift
  t=$(left)
  if [ "$t" -lt 90 ]; then
    echo "=== staged5: skipping $name (deadline) ===" >> "$LOG"; return 99
  fi
  echo "=== staged5: $name start $(date -u +%H:%M:%S) budget=${t}s ===" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  rc=$?
  echo "=== staged5: $name rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
  git add -A results/showcase
  git diff --cached --quiet || git commit -q -m "showcase(full): $name artifacts"
  return $rc
}

stage robustness-neural python -m nawc_tpu.cli.robustness --watermark neural \
  --filecount 124 --seconds 8.0 --codec_ckpt checkpoints/codec_24k.msgpack \
  --out_dir results/showcase/robustness_neural --resume && \
stage stats-neural python -m nawc_tpu.cli.stats \
  --results results/showcase/robustness_neural/test_results.csv \
  --out_dir results/showcase/robustness_neural/stats

stage robustness-chunked python -m nawc_tpu.cli.robustness --watermark chunked \
  --filecount 124 --seconds 8.0 --codec_ckpt checkpoints/codec_24k.msgpack \
  --out_dir results/showcase/robustness_chunked --resume && \
stage stats-chunked python -m nawc_tpu.cli.stats \
  --results results/showcase/robustness_chunked/test_results.csv \
  --out_dir results/showcase/robustness_chunked/stats

stage robustness-psychoacoustic python -m nawc_tpu.cli.robustness \
  --watermark psychoacoustic --filecount 124 --seconds 8.0 \
  --codec_ckpt checkpoints/codec_24k.msgpack \
  --out_dir results/showcase/robustness_psychoacoustic --resume && \
stage stats-psychoacoustic python -m nawc_tpu.cli.stats \
  --results results/showcase/robustness_psychoacoustic/test_results.csv \
  --out_dir results/showcase/robustness_psychoacoustic/stats

# commit any partial shards the deadline cut off
git add -A results/showcase
git diff --cached --quiet || git commit -q -m "showcase(full): partial robustness shards at session deadline"
echo "ALL STAGES5 DONE $(date -u +%H:%M:%S)" >> "$LOG"
