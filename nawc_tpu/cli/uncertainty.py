"""MC-uncertainty CLI (the reference's ``run_uncertainty_eval.py`` +
``analyze_uncertainty.py``): 20 noisy detector passes per clip, variance vs
error analysis, calibration.

Usage:
  python -m nawc_tpu.cli.uncertainty --watermark spread_spectrum --filecount 16
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
    ap.add_argument("--mc_samples", type=int, default=20)
    ap.add_argument("--noise_sigma", type=float, default=1e-3)
    ap.add_argument("--codec_ckpt", default="checkpoints/codec_24k.msgpack")
    ap.add_argument("--codec_size", choices=["full", "small"], default="full")
    ap.add_argument("--out_dir", default="results/uncertainty")
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    import pandas as pd

    from ..interp import expected_calibration_error, mc_statistics, reliability_curve, variance_error_auc
    from ..models.base import random_message

    codec = load_codec(args.codec_ckpt, args.codec_size) if args.watermark.startswith("semantic") else None
    wav = load_audio_batch(args.audio_glob, args.filecount, args.sample_rate, args.seconds)
    wm = build_watermarkers([args.watermark], codec, sample_rate=None if args.sample_rate == 16_000 else args.sample_rate)[args.watermark]

    key = jax.random.PRNGKey(0)
    if getattr(wm, "n_bits", 0) > 0:
        msg = random_message(key, wav.shape[0], wm.n_bits)
        marked = wm.embed(wav, msg, key)
    else:
        marked = wm.embed(wav)
    both = jnp.concatenate([marked, wav])
    labels = np.concatenate([np.ones(wav.shape[0]), np.zeros(wav.shape[0])]).astype(np.int32)

    stats = mc_statistics(
        wm.score, both, jax.random.PRNGKey(1), labels=labels,
        n_samples=args.mc_samples, sigma=args.noise_sigma,
    )
    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    df = pd.DataFrame({**stats, "label": labels})
    df.to_csv(out / "uncertainty_results.csv", index=False)
    auc = variance_error_auc(stats["mc_var_prob"], stats["correct"])
    ece = expected_calibration_error(stats["mc_mean_prob"], labels)
    c, a, n = reliability_curve(stats["mc_mean_prob"], labels)
    pd.DataFrame({"prob_bin": c, "accuracy": a, "count": n}).to_csv(out / "reliability_curve.csv", index=False)
    from ..eval.figures import plot_reliability_curve, plot_uncertainty_hist, plot_uncertainty_roc
    from ..eval.reporting import plot_variance_boxplots

    df["group"] = np.where(df.label == 1, "marked", "clean")
    plot_variance_boxplots(df, out / "variance_boxplots.png", group_col="group")
    plot_uncertainty_hist(df, out / "mc_var_prob_correct_vs_wrong_hist.png")
    plot_uncertainty_roc(df, out / "mc_var_prob_roc.png")
    plot_reliability_curve(c, a, out / "reliability_curve_mc_mean_prob.png")
    print(f"accuracy={stats['correct'].mean():.3f} var_error_auc={auc:.3f} ece={ece:.3f}")


if __name__ == "__main__":
    main()
