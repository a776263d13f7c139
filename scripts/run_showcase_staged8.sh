#!/bin/bash
# Round-5 artifact plan, ordered by VERDICT r4 priorities:
#   1. raw_bench-schema robustness trees (open since round 2 — run FIRST)
#   2. headline benchmarks (retrained neural + token_green z gate)
#   3. interp showcase refresh at reference scale
#   4. multi-dataset sweep (5 corpora x 6 methods)
#   5. quality refreshes (exact STOI) + codec eval
# Every stage commits its artifacts; robustness resumes via per-attack
# shards if the window cuts.
#
# Usage: run_showcase_staged8.sh <deadline-epoch-seconds> [stage-filter]
set -u
cd /root/repo
LOG=/tmp/showcase_staged8.log
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
    echo "=== staged8: worker down, waiting $(date -u +%H:%M:%S) ===" >> "$LOG"
    sleep 45
  done
  return 0
}

stage() {
  name=$1; shift
  if [ -n "$FILTER" ] && [[ "$name" != "$FILTER"* ]]; then return 99; fi
  t=$(left)
  if [ "$t" -lt 120 ]; then
    echo "=== staged8: skipping $name (deadline) ===" >> "$LOG"; return 99
  fi
  wait_worker || { echo "=== staged8: $name skipped, worker never back ===" >> "$LOG"; return 99; }
  echo "=== staged8: $name start $(date -u +%H:%M:%S) budget=${t}s ===" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  rc=$?
  echo "=== staged8: $name rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
  git add -A results/showcase
  git diff --cached --quiet || git commit -q -m "showcase(r5): $name artifacts"
  return $rc
}

SHOW="python scripts/make_showcase.py --scale full --only"

# 1. robustness trees (VERDICT #1): 124 x 8 s = 496 chunks x 21 attacks per
# method; neural runs shift-robust detection (detect_sync)
for m in spread_spectrum chunked psychoacoustic neural; do
  sub=robustness_$m; [ "$m" = spread_spectrum ] && sub=robustness
  extra=""; [ "$m" = neural ] && extra="--sync --detect_batch 134"
  stage robustness-$m python -m nawc_tpu.cli.robustness --watermark $m \
    --filecount 124 --seconds 12.0 --codec_ckpt checkpoints/codec_24k.msgpack \
    --out_dir results/showcase/$sub --resume $extra
  stage stats-$m python -m nawc_tpu.cli.stats \
    --results results/showcase/$sub/test_results.csv \
    --out_dir results/showcase/$sub/stats
done

# 2. headline benchmarks
stage benchmark-main $SHOW benchmark_main
stage sem-benchmark $SHOW benchmark_semantic

# 3. interp refresh at reference scale
stage manifold $SHOW manifold
stage ablation $SHOW ablation
stage uncertainty $SHOW uncertainty
stage perturbation $SHOW perturbation
stage pgd $SHOW pgd

# 4. datasets
stage datasets $SHOW benchmark_datasets

# 5. quality refreshes with the EXACT host STOI (r5 sweep: the on-device
# 1/3-octave approximation under-read semantic STOI 0.90 where pystoi-exact
# reads 0.997 — the r4 "STOI deficit" was the metric, not the audio)
stage quality-neural $SHOW quality:neural
stage quality-sem-pca $SHOW quality:semantic_pca
stage quality-sem-cluster $SHOW quality:semantic_cluster
stage quality-sem-random $SHOW quality:semantic_random
stage quality-token $SHOW quality:token_green
stage quality-summary $SHOW quality:summary
stage eval-codec $SHOW eval_codec

git add -A results/showcase
git diff --cached --quiet || git commit -q -m "showcase(r5): partial artifacts at deadline"
echo "ALL STAGED8 DONE $(date -u +%H:%M:%S)" >> "$LOG"
