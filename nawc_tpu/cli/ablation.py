"""Codebook-layer ablation CLI (the reference's
``run_snac_layer_ablation.py`` + its plot script).

Usage:
  python -m nawc_tpu.cli.ablation --watermarks spread_spectrum --filecount 8
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main(argv=None) -> None:
    from .common import DEFAULT_AUDIO_GLOB, WM_CHOICES, build_watermarkers, load_audio_batch, load_codec

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--audio_glob", default=DEFAULT_AUDIO_GLOB)
    ap.add_argument("--watermarks", nargs="+", default=["spread_spectrum"], choices=WM_CHOICES)
    ap.add_argument("--filecount", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--sample_rate", type=int, default=16_000)
    ap.add_argument("--codec_ckpt", default="checkpoints/codec_24k.msgpack")
    ap.add_argument("--codec_size", choices=["full", "small"], default="full")
    ap.add_argument("--out_dir", default="results/ablation")
    args = ap.parse_args(argv)

    from ..eval.reporting import plot_ablation_heatmap
    from ..interp import run_layer_ablation

    codec = load_codec(args.codec_ckpt, args.codec_size)
    wav = load_audio_batch(args.audio_glob, args.filecount, args.sample_rate, args.seconds)
    from ..models import at_rate

    # fixed-rate methods join via the resampling adapter so one ablation
    # grid covers all watermark families at a single sweep rate
    # (reference run_snac_layer_ablation.py:167-235 mixes all six methods)
    wms = {n: at_rate(w, args.sample_rate)
           for n, w in build_watermarkers(
               args.watermarks, codec,
               sample_rate=None if args.sample_rate == 16_000 else args.sample_rate).items()}

    df = run_layer_ablation(codec, wms, wav, in_sr=args.sample_rate)
    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    df.to_csv(out / "layer_ablation.csv", index=False)
    plot_ablation_heatmap(df, out / "ablation_heatmap.png")

    from ..eval.figures import plot_ablation_per_wm_bars

    for p in plot_ablation_per_wm_bars(df, out):
        print(f"saved {p}")
    print(df.pivot_table(index="mask", columns="watermark", values="score", aggfunc="mean").to_string())


if __name__ == "__main__":
    main()
