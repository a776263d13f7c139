#!/bin/bash
# Round-3 showcase continuation (after the sswm VMEM-tile fix): repair the
# stages that failed pre-fix, then the reference-scale robustness sweeps
# method-by-method so every finished tree is committed before the next
# starts (cutoff-safe), then the interp sweeps.
set -u
cd /root/repo
P="python scripts/make_showcase.py --scale full"

stage() {
  name=$1; shift
  echo "=== staged2: $name start $(date -u +%H:%M:%S) ===" >> /tmp/showcase_staged.log
  timeout 14400 "$@" >> /tmp/showcase_staged.log 2>&1
  rc=$?
  echo "=== staged2: $name rc=$rc $(date -u +%H:%M:%S) ===" >> /tmp/showcase_staged.log
  git add -A results/showcase
  git diff --cached --quiet || git commit -q -m "showcase(full): $name artifacts"
}

# benchmark repair: all four fixed-rate methods together (coherent CSVs)
stage benchmark-repair $P --only benchmark benchmark_semantic
# quality repair: the four codec-latent methods that OOM'd pre-sub-batching
for m in semantic_pca semantic_cluster semantic_random token_green; do
  stage "quality-$m" python -m nawc_tpu.cli.quality --watermark "$m" \
    --filecount 120 --seconds 5.0 --sample_rate 24000 \
    --codec_ckpt checkpoints/codec_24k.msgpack \
    --out_csv "results/showcase/quality/$(python -c "import sys; sys.path.insert(0,'scripts'); from make_showcase import QUALITY_NAME; print(QUALITY_NAME['$m'])")_quality_results.csv"
done
stage quality-summary python -m nawc_tpu.cli.quality --summarize_dir results/showcase/quality
# reference-scale robustness, one method per commit
for m in neural chunked psychoacoustic spread_spectrum; do
  sub=robustness; [ "$m" != spread_spectrum ] && sub="robustness_$m"
  stage "robustness-$m" python -m nawc_tpu.cli.robustness --watermark "$m" \
    --filecount 124 --seconds 8.0 --codec_ckpt checkpoints/codec_24k.msgpack \
    --out_dir "results/showcase/$sub" --resume
  stage "stats-$m" python -m nawc_tpu.cli.stats \
    --results "results/showcase/$sub/test_results.csv" \
    --out_dir "results/showcase/$sub/stats"
done
stage interp $P --only manifold ablation uncertainty perturbation pgd_exp_b pgd_interp
echo "ALL STAGES2 DONE $(date -u +%H:%M:%S)" >> /tmp/showcase_staged.log
