"""Watermark-residual spectral analysis CLI (the reference's
``analyze_perturbation.py``): residual wm - clean -> SNR histogram +
per-band spectral footprint, computed batched on-device.

Usage:
  python -m nawc_tpu.cli.perturbation --watermark spread_spectrum --filecount 16
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import numpy as np


def main(argv=None) -> None:
    from .common import DEFAULT_AUDIO_GLOB, WM_CHOICES, build_watermarkers, load_audio_batch, load_codec

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--audio_glob", default=DEFAULT_AUDIO_GLOB)
    ap.add_argument("--watermark", default="spread_spectrum", choices=WM_CHOICES)
    ap.add_argument("--filecount", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--sample_rate", type=int, default=16_000)
    ap.add_argument("--n_bands", type=int, default=16)
    ap.add_argument("--codec_ckpt", default="checkpoints/codec_24k.msgpack")
    ap.add_argument("--codec_size", choices=["full", "small"], default="full")
    ap.add_argument("--out_dir", default="results/perturbation")
    args = ap.parse_args(argv)

    import pandas as pd

    from ..eval.figures import plot_snr_histogram, plot_spectral_footprint
    from ..interp import residual_report
    from ..models.base import random_message

    codec = load_codec(args.codec_ckpt, args.codec_size) if args.watermark.startswith("semantic") else None
    wav = load_audio_batch(args.audio_glob, args.filecount, args.sample_rate, args.seconds)
    wm = build_watermarkers(
        [args.watermark], codec, sample_rate=None if args.sample_rate == 16_000 else args.sample_rate
    )[args.watermark]

    key = jax.random.PRNGKey(0)
    if getattr(wm, "n_bits", 0) > 0:
        msg = random_message(key, wav.shape[0], wm.n_bits)
        marked = wm.embed(wav, msg, key)
    else:
        marked = wm.embed(wav)

    rep = residual_report(wav, marked, n_bands=args.n_bands)
    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    df = pd.DataFrame({
        "clip": np.arange(wav.shape[0]),
        "snr_db": rep["snr_db"],
        **{f"band_{i}_energy": rep["band_energy"][:, i] for i in range(rep["band_energy"].shape[1])},
    })
    df.to_csv(out / "perturbation_analysis.csv", index=False)
    plot_snr_histogram(rep["snr_db"], out / "snr_histogram.png")
    plot_spectral_footprint(rep["band_energy"], out / "spectral_footprint.png")
    print(f"snr_db mean={rep['snr_db'].mean():.2f} -> {out}")


if __name__ == "__main__":
    main()
