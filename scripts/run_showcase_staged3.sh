#!/bin/bash
# Round-3 showcase continuation, session 2 (fresh VM — /tmp state lost).
# Remaining judge-priority stages in order:
#   1. benchmark_semantic regeneration (stale round-1 threshold_summary
#      contradicts round-2 operating-point evidence — VERDICT missing #5)
#   2. neural 20-attack reference-scale robustness (VERDICT weak #7:
#      verify bitwise/distorted >= 0.89)
#   3. regenerated semantic/token_green quality tables (spectral shaping
#      landed this round; committed rows are stale n=8 pre-shaping)
#   4. remaining per-method robustness trees at reference scale
#   5. interp sweeps over all methods
# Every stage commits its artifacts on completion so a round cutoff never
# loses finished evidence.
set -u
cd /root/repo
P="python scripts/make_showcase.py --scale full"
LOG=/tmp/showcase_staged.log

stage() {
  name=$1; shift
  echo "=== staged3: $name start $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 14400 "$@" >> "$LOG" 2>&1
  rc=$?
  echo "=== staged3: $name rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
  git add -A results/showcase
  git diff --cached --quiet || git commit -q -m "showcase(full): $name artifacts"
}

stage benchmark-semantic $P --only benchmark_semantic

stage robustness-neural python -m nawc_tpu.cli.robustness --watermark neural \
  --filecount 124 --seconds 8.0 --codec_ckpt checkpoints/codec_24k.msgpack \
  --out_dir results/showcase/robustness_neural --resume
stage stats-neural python -m nawc_tpu.cli.stats \
  --results results/showcase/robustness_neural/test_results.csv \
  --out_dir results/showcase/robustness_neural/stats

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

# spread_spectrum last: clear the 16-clip round-1 shards so --resume does
# not mix scales, then regenerate the tree at reference scale
rm -f results/showcase/robustness/shards/*.csv
stage robustness-spread_spectrum python -m nawc_tpu.cli.robustness \
  --watermark spread_spectrum --filecount 124 --seconds 8.0 \
  --codec_ckpt checkpoints/codec_24k.msgpack \
  --out_dir results/showcase/robustness --resume
stage stats-spread_spectrum python -m nawc_tpu.cli.stats \
  --results results/showcase/robustness/test_results.csv \
  --out_dir results/showcase/robustness/stats

stage interp $P --only manifold ablation uncertainty perturbation pgd_exp_b pgd_interp
echo "ALL STAGES3 DONE $(date -u +%H:%M:%S)" >> "$LOG"
