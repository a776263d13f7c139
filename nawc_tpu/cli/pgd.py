"""PGD / latent-PCA research CLI (the reference's ``pgd_research`` suite:
attack_test, attack_baselines, experiments A/B/C, pgd_interpretability).

Modes:
  attack      plain sign-PGD vs the watermark score (C23)
  baselines   DSP + PCA latent attacks comparison (C24)
  exp_a       watermark latent-delta metrics (C25)
  exp_b       PCA reconstruction-attack K-sweep (C26)
  exp_c       standard vs subspace-protected PGD (C27)
  interp      PGD + head/tail PCA energy decomposition (C22)

Usage:
  python -m nawc_tpu.cli.pgd --mode exp_b --filecount 8
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None) -> None:
    from .common import DEFAULT_AUDIO_GLOB, build_watermarkers, load_audio_batch, load_codec

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", choices=["attack", "baselines", "exp_a", "exp_b", "exp_c", "interp"], default="attack")
    ap.add_argument("--audio_glob", default=DEFAULT_AUDIO_GLOB)
    ap.add_argument("--watermark", default="spread_spectrum")
    ap.add_argument("--filecount", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--sample_rate", type=int, default=16_000)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--eps", type=float, default=0.02)
    ap.add_argument("--lr", type=float, default=0.001)
    ap.add_argument("--pca_components", type=int, default=128)
    ap.add_argument("--head_k", type=int, default=60)
    ap.add_argument("--codec_ckpt", default="checkpoints/codec_24k.msgpack")
    ap.add_argument("--codec_size", choices=["full", "small"], default="full")
    ap.add_argument("--out_dir", default="results/pgd")
    args = ap.parse_args(argv)

    import pandas as pd

    from ..attacks import latent_transform_attack, pgd_attack, subspace_pgd_attack
    from ..eval.metrics import si_snr
    from ..interp import get_latent
    from ..interp.latent_pca import (
        amputation_fn,
        fit_pca,
        head_tail_energy,
        jamming_fn,
        latent_delta_metrics,
        reconstruction_attack_sweep,
        rounding_fn,
    )
    from ..models.base import random_message
    from ..utils.padding import pad_to_multiple

    codec = load_codec(args.codec_ckpt, args.codec_size)
    wav = load_audio_batch(args.audio_glob, args.filecount, args.sample_rate, args.seconds)
    wm = build_watermarkers([args.watermark], codec, sample_rate=None if args.sample_rate == 16_000 else args.sample_rate)[args.watermark]

    key = jax.random.PRNGKey(0)
    if getattr(wm, "n_bits", 0) > 0:
        msg = random_message(key, wav.shape[0], wm.n_bits)
        marked = wm.embed(wav, msg, key)
    else:
        msg = None
        marked = wm.embed(wav)

    # white-box attacks need gradients: prefer a differentiable soft score
    # (e.g. ChunkedWM's 1-BER reference score is a hard step function)
    score_attr = getattr(wm, "score_soft", wm.score)

    def score_fn(w):
        return score_attr(w, msg) if msg is not None else score_attr(w)

    def latent_fn(w):
        return get_latent(codec, pad_to_multiple(w, codec.cfg.chunk))

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)

    if args.mode == "attack":
        attacked = pgd_attack(score_fn, marked, steps=args.steps, eps=args.eps, lr=args.lr)
        df = pd.DataFrame({
            "score_before": np.asarray(score_fn(marked)),
            "score_after": np.asarray(score_fn(attacked)),
            "snr_db": np.asarray(si_snr(marked, attacked)),
        })
        df.to_csv(out / "pgd_attack.csv", index=False)
        print(df.mean().to_string())

    elif args.mode == "baselines":
        z = latent_fn(wav)
        mean, comps, _ = fit_pca(z, args.pca_components)
        attacks = {
            "clean": lambda w: w,
            "gaussian_noise": lambda w: w + 0.003 * jax.random.normal(key, w.shape),
            "pca_amputation": lambda w: latent_transform_attack(codec, w, amputation_fn(mean, comps, args.head_k)),
            "pca_jamming": lambda w: latent_transform_attack(codec, w, jamming_fn(mean, comps, args.head_k, key)),
            "latent_rounding": lambda w: latent_transform_attack(codec, w, rounding_fn(5.0)),
        }
        rows = []
        for name, fn in attacks.items():
            att = fn(marked)
            rows.append({
                "attack": name,
                "score": float(np.asarray(score_fn(att)).mean()),
                "snr_db": float(np.asarray(si_snr(marked, att)).mean()),
            })
        df = pd.DataFrame(rows)
        df.to_csv(out / "attack_baselines.csv", index=False)

        from ..eval.figures import plot_detection_vs_snr

        plot_detection_vs_snr(
            df, out / "benchmark_chart.png",
            title=f"Comparison: Subspace Attacks vs Baselines (K={args.head_k})",
        )
        print(df.to_string(index=False))

    elif args.mode == "exp_a":
        m = latent_delta_metrics(latent_fn(wav), latent_fn(marked))
        pd.DataFrame({k: v for k, v in m.items() if k != "pca_cumvar"}).to_csv(out / "exp_a_metrics.csv", index=False)
        pd.DataFrame({"pca_cumvar": m["pca_cumvar"]}).to_csv(out / "exp_a_cumvar.csv", index=False)
        print({k: float(np.mean(v)) for k, v in m.items()})

    elif args.mode == "exp_b":
        z = latent_fn(wav)
        mean, comps, _ = fit_pca(z, args.pca_components)
        ks = [k for k in (10, 20, 50, 80, 100, args.pca_components) if k <= args.pca_components]
        df = reconstruction_attack_sweep(codec, wm, marked, mean, comps, ks, msg)
        df.to_csv(out / "exp_b_reconstruction.csv", index=False)
        print(df.to_string(index=False))

    elif args.mode == "exp_c":
        z = latent_fn(wav)
        mean, comps, _ = fit_pca(z, args.pca_components)
        std = pgd_attack(score_fn, marked, steps=args.steps, eps=args.eps, lr=args.lr)
        sub = subspace_pgd_attack(
            score_fn, latent_fn, marked, comps[: args.head_k],
            steps=args.steps, eps=args.eps, lr=args.lr,
        )
        per_clip = {
            "standard_pgd": (np.asarray(si_snr(marked, std)), np.asarray(score_fn(std))),
            "subspace_pgd": (np.asarray(si_snr(marked, sub)), np.asarray(score_fn(sub))),
        }
        df = pd.DataFrame([
            {"method": m, "clip": i, "snr_db": float(s[i]), "score": float(p[i])}
            for m, (s, p) in per_clip.items() for i in range(len(s))
        ])
        df.to_csv(out / "exp_c_comparison.csv", index=False)

        from ..eval.figures import plot_pgd_scatter

        plot_pgd_scatter(per_clip, out / "experiment_c_results.png")
        print(df.groupby("method")[["score", "snr_db"]].mean().to_string())

    else:  # interp
        z = latent_fn(wav)
        mean, comps, _ = fit_pca(z, args.pca_components)
        attacked = pgd_attack(score_fn, marked, steps=args.steps, eps=args.eps, lr=args.lr)
        dz = latent_fn(attacked) - latent_fn(marked)
        head, tail = head_tail_energy(dz, comps, args.head_k)
        df = pd.DataFrame([{"head_energy": head, "tail_energy": tail,
                            "head_fraction": head / (head + tail + 1e-12)}])
        df.to_csv(out / "pgd_interpretability.csv", index=False)
        print(df.to_string(index=False))


if __name__ == "__main__":
    main()
