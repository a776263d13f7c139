"""Manifold analysis CLI (the reference's
``run_manifold_analysis_all.py`` entry, ``:518-556``).

Usage:
  python -m nawc_tpu.cli.manifold --watermarks spread_spectrum semantic_cluster \
      --filecount 8 --out_dir results/manifold
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
    ap.add_argument("--codec_ckpt", default="checkpoints/codec_24k.msgpack")
    ap.add_argument("--codec_size", choices=["full", "small"], default="full")
    ap.add_argument("--out_dir", default="results/manifold")
    args = ap.parse_args(argv)

    from ..attacks import codec_roundtrip
    from ..interp import run_manifold_analysis

    codec = load_codec(args.codec_ckpt, args.codec_size)
    sr = codec.cfg.sample_rate
    wav = load_audio_batch(args.audio_glob, args.filecount, sr, args.seconds)
    from ..models import at_rate

    # fixed-rate methods (chunked/psychoacoustic/neural) join the sweep via
    # the resampling adapter, mirroring the reference's all-methods manifold
    # run (run_manifold_analysis_all.py:325-515)
    wms = {n: at_rate(w, sr)
           for n, w in build_watermarkers(args.watermarks, codec, sample_rate=sr).items()}

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    df = run_manifold_analysis(
        codec, wms, wav, lambda w: codec_roundtrip(codec, w),
        triplet_dir=out / "plots",
    )
    df.to_csv(out / "manifold_analysis.csv", index=False)

    from ..eval.figures import plot_manifold_global

    for p in plot_manifold_global(df, out):
        print(f"saved {p}")
    print(df.groupby("watermark")[["delta_wm", "delta_att", "score_wm", "score_att"]].mean().to_string())


if __name__ == "__main__":
    main()
