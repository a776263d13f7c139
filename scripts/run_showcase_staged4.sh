#!/bin/bash
# Round-3 session-2 recovery plan.  The TPU worker crashed mid
# benchmark_semantic (kernel fault, axon worker did not come back for
# >15 min); this script waits for the chip to answer a trivial d2h fetch,
# then runs the remaining judge-priority stages with the known-good
# workload first and the suspect semantic stage at reduced scale behind a
# liveness gate, committing artifacts after every stage.
set -u

# SUPERSEDED by run_showcase_staged5.sh (and later plans).  This script's
# semantic stages (`cli.quality --watermark semantic_cluster --filecount 64
# --seconds 5.0`) are the exact configuration that kernel-faulted the axon
# TPU worker twice on 2026-08-20 (~15 min outage each; see CLAUDE.md and
# docs/roadmap.md) — the probe gate below only detects the crash AFTER it
# happens.  Opt in explicitly if you really want to rerun it.
if [ "${NAWC_ALLOW_STAGED4:-0}" != "1" ]; then
  echo "run_showcase_staged4.sh is superseded (semantic stages reproduce the" \
       "TPU worker crash); set NAWC_ALLOW_STAGED4=1 to override" >&2
  exit 2
fi

cd /root/repo
LOG=/tmp/showcase_staged.log

probe() {
  timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
print('probe ok', float(np.asarray(jnp.ones((8,128))).sum()))" >> "$LOG" 2>&1
}

echo "=== staged4: waiting for TPU worker $(date -u +%H:%M:%S) ===" >> "$LOG"
until probe; do sleep 45; done
echo "=== staged4: TPU back $(date -u +%H:%M:%S) ===" >> "$LOG"

stage() {
  name=$1; shift
  echo "=== staged4: $name start $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 14400 "$@" >> "$LOG" 2>&1
  rc=$?
  echo "=== staged4: $name rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
  git add -A results/showcase
  git diff --cached --quiet || git commit -q -m "showcase(full): $name artifacts"
  if ! probe; then
    echo "=== staged4: worker dead after $name, aborting $(date -u +%H:%M:%S) ===" >> "$LOG"
    exit 1
  fi
}

stage robustness-neural python -m nawc_tpu.cli.robustness --watermark neural \
  --filecount 124 --seconds 8.0 --codec_ckpt checkpoints/codec_24k.msgpack \
  --out_dir results/showcase/robustness_neural --resume
stage stats-neural python -m nawc_tpu.cli.stats \
  --results results/showcase/robustness_neural/test_results.csv \
  --out_dir results/showcase/robustness_neural/stats

# suspect stage (crashed the worker at n_sem=24): retry at half scale,
# still 1.5x the round-2 n=8 evidence
stage benchmark-semantic python -m nawc_tpu.cli.benchmark \
  --mode both --watermarks semantic_pca semantic_cluster semantic_random token_green \
  --filecount 12 --seconds 5.0 --sample_rate 24000 \
  --codec_ckpt checkpoints/codec_24k.msgpack \
  --out_dir results/showcase/benchmark_semantic

for m in semantic_pca semantic_cluster semantic_random token_green; do
  case $m in
    semantic_pca) qn=SemanticPCA;; semantic_cluster) qn=SemanticCluster;;
    semantic_random) qn=SemanticRandom;; token_green) qn=TokenGreen;;
  esac
  stage "quality-$m" python -m nawc_tpu.cli.quality --watermark "$m" \
    --filecount 64 --seconds 5.0 --sample_rate 24000 \
    --codec_ckpt checkpoints/codec_24k.msgpack \
    --out_csv "results/showcase/quality/${qn}_quality_results.csv"
done
stage quality-summary python -m nawc_tpu.cli.quality --summarize_dir results/showcase/quality

for m in chunked psychoacoustic; do
  stage "robustness-$m" python -m nawc_tpu.cli.robustness --watermark "$m" \
    --filecount 124 --seconds 8.0 --codec_ckpt checkpoints/codec_24k.msgpack \
    --out_dir "results/showcase/robustness_$m" --resume
  stage "stats-$m" python -m nawc_tpu.cli.stats \
    --results "results/showcase/robustness_$m/test_results.csv" \
    --out_dir "results/showcase/robustness_$m/stats"
done

rm -f results/showcase/robustness/shards/*.csv
stage robustness-spread_spectrum python -m nawc_tpu.cli.robustness \
  --watermark spread_spectrum --filecount 124 --seconds 8.0 \
  --codec_ckpt checkpoints/codec_24k.msgpack \
  --out_dir results/showcase/robustness --resume
stage stats-spread_spectrum python -m nawc_tpu.cli.stats \
  --results results/showcase/robustness/test_results.csv \
  --out_dir results/showcase/robustness/stats

stage interp python scripts/make_showcase.py --scale full \
  --only manifold ablation uncertainty perturbation pgd_exp_b pgd_interp
echo "ALL STAGES4 DONE $(date -u +%H:%M:%S)" >> "$LOG"
