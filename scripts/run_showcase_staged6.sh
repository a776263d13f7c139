#!/bin/bash
# Round-4 evidence plan.  Runs every full-scale showcase stage in its OWN
# process (a TPU worker crash costs one stage, not the sweep), waits for
# worker recovery between stages, commits artifacts after each stage, and
# propagates stage rc so dependent stages skip on failure.
#
# Judge-priority order (VERDICT r4): semantic evidence first (the round-3
# gap), then reference-scale robustness trees, then the interp refresh,
# multi-dataset sweep, and the rest.
#
# Usage: run_showcase_staged6.sh <deadline-epoch-seconds> [stage-filter]
set -u
cd /root/repo
LOG=/tmp/showcase_staged6.log
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
    echo "=== staged6: worker down, waiting $(date -u +%H:%M:%S) ===" >> "$LOG"
    sleep 45
  done
  return 0
}

stage() {
  # rc: command's rc; 99 = skipped (deadline/filter/worker-never-back)
  name=$1; shift
  if [ -n "$FILTER" ] && [[ "$name" != "$FILTER"* ]]; then return 99; fi
  t=$(left)
  if [ "$t" -lt 120 ]; then
    echo "=== staged6: skipping $name (deadline) ===" >> "$LOG"; return 99
  fi
  wait_worker || { echo "=== staged6: $name skipped, worker never back ===" >> "$LOG"; return 99; }
  echo "=== staged6: $name start $(date -u +%H:%M:%S) budget=${t}s ===" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  rc=$?
  echo "=== staged6: $name rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
  git add -A results/showcase
  git diff --cached --quiet || git commit -q -m "showcase(r4): $name artifacts"
  return $rc
}

SHOW="python scripts/make_showcase.py --scale full --only"

# 1) semantic evidence (VERDICT #1): fresh benchmark_semantic + semantic
#    quality at n=120 with the crash-fixed embed; the stale round-1 CSVs are
#    replaced in-place by the CLIs
stage sem-benchmark $SHOW benchmark_semantic
stage sem-quality-pca $SHOW quality:semantic_pca
stage sem-quality-cluster $SHOW quality:semantic_cluster
stage sem-quality-random $SHOW quality:semantic_random

# 2) reference-scale robustness trees (VERDICT #2): 124 x 8 s, ~9.9k chunk
#    rows/method, per-attack shard resume
for m in spread_spectrum chunked neural psychoacoustic; do
  sub=robustness_$m; [ "$m" = spread_spectrum ] && sub=robustness
  stage robustness-$m python -m nawc_tpu.cli.robustness --watermark $m \
    --filecount 124 --seconds 8.0 --codec_ckpt checkpoints/codec_24k.msgpack \
    --out_dir results/showcase/$sub --resume && \
  stage stats-$m python -m nawc_tpu.cli.stats \
    --results results/showcase/$sub/test_results.csv \
    --out_dir results/showcase/$sub/stats
done

# 3) regenerate the main benchmark tree with the fixed attacks (round-3's
#    5 compile/OOM error rows -> zero) and the retrained neural ckpt
stage benchmark-main $SHOW benchmark_main

# 4) interp refresh at reference scale (VERDICT #4)
stage manifold $SHOW manifold
stage ablation $SHOW ablation
stage uncertainty $SHOW uncertainty
stage perturbation $SHOW perturbation
stage pgd $SHOW pgd

# 5) multi-dataset sweep (VERDICT #7)
stage datasets $SHOW benchmark_datasets

# 6) refresh the remaining quality tables + summary with current ckpts
#    (semantic tables were regenerated in step 1; don't repeat the embeds)
stage quality-rest $SHOW quality:spread_spectrum quality:chunked \
  quality:psychoacoustic quality:neural quality:token_green quality:summary
stage eval-codec $SHOW eval_codec

git add -A results/showcase
git diff --cached --quiet || git commit -q -m "showcase(r4): partial artifacts at deadline"
echo "ALL STAGED6 DONE $(date -u +%H:%M:%S)" >> "$LOG"
