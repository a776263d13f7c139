"""Robustness sweep CLI (replaces the external raw_bench dependency of
``interpretability_research/scripts/eval.py`` + ``compute_watermark_stats.py``):
per-chunk results with the raw_bench schema, overall + per-attack stats.

Usage:
  python -m nawc_tpu.cli.robustness --watermark spread_spectrum --filecount 16 \
      --out_dir results/robustness
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None) -> None:
    from .common import DEFAULT_AUDIO_GLOB, WM_CHOICES, build_watermarkers, load_audio_clips, load_codec

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--audio_glob", default=DEFAULT_AUDIO_GLOB)
    ap.add_argument("--watermark", default="spread_spectrum", choices=WM_CHOICES)
    ap.add_argument("--filecount", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--chunk_seconds", type=float, default=2.0)
    ap.add_argument("--sample_rate", type=int, default=16_000)
    ap.add_argument("--codec_ckpt", default="checkpoints/codec_24k.msgpack")
    ap.add_argument("--codec_size", choices=["full", "small"], default="full")
    ap.add_argument("--out_dir", default="results/robustness")
    ap.add_argument("--sync", action="store_true",
                    help="use shift-robust sync detection when the watermark supports it")
    ap.add_argument("--detect_batch", type=int, default=None,
                    help="host-side detection sub-batch (chunks); bounds peak "
                         "HBM for conv-detector methods — pick a divisor of "
                         "the chunk count to avoid an extra compile shape")
    ap.add_argument("--resume", action="store_true",
                    help="skip attacks whose per-attack shard CSV already exists "
                         "(restartable sweeps, SURVEY.md §5)")
    args = ap.parse_args(argv)

    from ..attacks import build_suite
    from ..eval import overall_stats, run_robustness, stats_by_attack, write_results_csv

    codec = load_codec(args.codec_ckpt, args.codec_size)
    # native-length clips (capped at --seconds): zero-padding clips to a
    # fixed crop fabricates silence chunks the schema would count as decode
    # failures (see load_audio_clips docstring)
    clips = load_audio_clips(args.audio_glob, args.filecount, args.sample_rate, args.seconds)
    wm = build_watermarkers([args.watermark], codec, sample_rate=None if args.sample_rate == 16_000 else args.sample_rate)[args.watermark]
    suite = build_suite(args.sample_rate, codec)
    suite.pop("identity", None)
    out = Path(args.out_dir)
    shard_dir = out / "shards"
    shard_dir.mkdir(parents=True, exist_ok=True)

    # per-attack shard files -> a killed sweep resumes where it stopped
    import pandas as pd

    frames = []
    for aname, afn in suite.items():
        shard = shard_dir / f"{aname}.csv"
        if args.resume and shard.exists():
            frames.append(pd.read_csv(shard))
            continue
        part = run_robustness(wm, {aname: afn}, clips, args.sample_rate, args.chunk_seconds, sync=args.sync, detect_batch=args.detect_batch)
        part.to_csv(shard, index=False)
        frames.append(part)
    df = pd.concat(frames, ignore_index=True)
    write_results_csv(df, str(out / "test_results.csv"))
    overall_stats(df).to_csv(out / "overall_stats.csv", index=False)
    stats_by_attack(df).to_csv(out / "stats_by_attack.csv", index=False)
    from ..eval.reporting import plot_metric_boxplots

    plot_metric_boxplots(df, out / "sisnr_by_attack.png", metric_col="sisnr_attack")
    cols = ["bitwise/clean_mean", "bitwise/distorted_mean", "hard/clean_mean", "hard/distorted_mean", "sisnr_wm_mean"]
    print(stats_by_attack(df).set_index("attack_type")[cols].round(3).to_string())


if __name__ == "__main__":
    main()
