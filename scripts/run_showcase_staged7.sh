#!/bin/bash
# Round-4 tail plan (relieves staged6 after the semantic quality stages):
# breadth-first — every showcase family gets a current artifact before the
# open-ended robustness sweeps eat the remaining window.  sem-benchmark
# reruns because the committed tree predates the time_jitter OOB-NaN fix.
#
# Usage: run_showcase_staged7.sh <deadline-epoch-seconds> [stage-filter]
set -u
cd /root/repo
LOG=/tmp/showcase_staged7.log
DEADLINE=${1:?deadline epoch}
FILTER=${2:-}

left() { echo $(( DEADLINE - $(date +%s) )); }

probe() {
  timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
print('probe ok', float(np.asarray(jnp.ones((8,128))).sum()))" >> "$LOG" 2>&1
}

wait_worker() {
  until probe; do
    [ "$(left)" -lt 180 ] && return 1
    echo "=== staged7: worker down, waiting $(date -u +%H:%M:%S) ===" >> "$LOG"
    sleep 45
  done
  return 0
}

stage() {
  name=$1; shift
  if [ -n "$FILTER" ] && [[ "$name" != "$FILTER"* ]]; then return 99; fi
  t=$(left)
  if [ "$t" -lt 120 ]; then
    echo "=== staged7: skipping $name (deadline) ===" >> "$LOG"; return 99
  fi
  wait_worker || { echo "=== staged7: $name skipped, worker never back ===" >> "$LOG"; return 99; }
  echo "=== staged7: $name start $(date -u +%H:%M:%S) budget=${t}s ===" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  rc=$?
  echo "=== staged7: $name rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
  git add -A results/showcase
  git diff --cached --quiet || git commit -q -m "showcase(r4): $name artifacts"
  return $rc
}

SHOW="python scripts/make_showcase.py --scale full --only"

stage benchmark-main $SHOW benchmark_main
stage sem-benchmark $SHOW benchmark_semantic
stage datasets $SHOW benchmark_datasets
stage manifold $SHOW manifold
stage ablation $SHOW ablation
stage uncertainty $SHOW uncertainty
stage perturbation $SHOW perturbation
stage pgd $SHOW pgd
stage quality-rest $SHOW quality:spread_spectrum quality:chunked \
  quality:psychoacoustic quality:neural quality:token_green quality:summary
stage eval-codec $SHOW eval_codec

for m in spread_spectrum chunked neural psychoacoustic; do
  sub=robustness_$m; [ "$m" = spread_spectrum ] && sub=robustness
  stage robustness-$m python -m nawc_tpu.cli.robustness --watermark $m \
    --filecount 124 --seconds 8.0 --codec_ckpt checkpoints/codec_24k.msgpack \
    --out_dir results/showcase/$sub --resume && \
  stage stats-$m python -m nawc_tpu.cli.stats \
    --results results/showcase/$sub/test_results.csv \
    --out_dir results/showcase/$sub/stats
done

git add -A results/showcase
git diff --cached --quiet || git commit -q -m "showcase(r4): partial artifacts at deadline"
echo "ALL STAGED7 DONE $(date -u +%H:%M:%S)" >> "$LOG"
