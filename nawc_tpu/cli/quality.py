"""Audio-quality evaluation CLI (the reference's
``audio_quality_check/evaluate_quality.py`` + ``make_pairs.py``).

Two modes:
  * --results_dir: walk artifact tree pairing 1_original/2_watermarked wavs
  * --watermark: embed on the fly and evaluate

Usage:
  python -m nawc_tpu.cli.quality --watermark spread_spectrum --filecount 16
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import numpy as np


def summarize_quality_dir(dir_: str) -> None:
    """<dir>/*_quality_results.csv -> quality_summary.csv with one row per
    method: SI-SNR wm / SNR / LSD / PESQ / STOI means (the shape of
    BASELINE.md §6.1, i.e. the reference's ``audio_quality_check`` tables)."""
    import pandas as pd

    rows = []
    for p in sorted(Path(dir_).glob("*_quality_results.csv")):
        df = pd.read_csv(p)
        rows.append({
            "method": p.name.replace("_quality_results.csv", ""),
            "n_pairs": len(df),
            "si_snr_wm_db": df["si_snr_watermarked"].mean(),
            "snr_db": df["snr"].mean(),
            "lsd": df["lsd"].mean(),
            "pesq": df["pesq"].mean() if "pesq" in df else float("nan"),
            "stoi": df["stoi"].mean(),
            "lsd_native_sr": df["lsd_native"].mean() if "lsd_native" in df else float("nan"),
        })
    from ..eval.metrics import pesq_impl

    rows = [{**r, "pesq_impl": pesq_impl()} for r in rows]
    if not rows:
        raise SystemExit(f"no *_quality_results.csv under {dir_}")
    out = pd.DataFrame(rows)
    out_path = Path(dir_) / "quality_summary.csv"
    out.to_csv(out_path, index=False)
    print(out.to_string(index=False))
    print(f"wrote {out_path}")


def main(argv=None) -> None:
    from .common import DEFAULT_AUDIO_GLOB, WM_CHOICES, build_watermarkers, load_audio_batch, load_codec

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--results_dir", default=None, help="artifact tree with wav pairs")
    ap.add_argument("--watermark", default=None, choices=WM_CHOICES)
    ap.add_argument("--audio_glob", default=DEFAULT_AUDIO_GLOB)
    ap.add_argument("--filecount", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--sample_rate", type=int, default=16_000)
    ap.add_argument("--codec_ckpt", default="checkpoints/codec_24k.msgpack")
    ap.add_argument("--codec_size", choices=["full", "small"], default="full")
    ap.add_argument("--out_csv", default="results/quality_results.csv")
    ap.add_argument("--embed_batch", type=int, default=16,
                    help="fly-embed sub-batch size: the semantic Adam-PGD "
                         "embed holds STFTs + optimizer state for the whole "
                         "batch in HBM, which OOMs one chip somewhere above "
                         "~32 clips x 5 s @ 24 kHz; sub-batching keeps memory "
                         "flat with one compile (all sub-batches same shape)")
    ap.add_argument("--summarize_dir", default=None,
                    help="aggregate <dir>/*_quality_results.csv into a "
                         "BASELINE-style six-method summary table, then exit")
    ap.add_argument("--probe", action="store_true",
                    help="preflight the watermark at n=2 x 1 s in a disposable "
                         "subprocess before the full-scale embed (crash guard; "
                         "VERDICT r3 #8)")
    args = ap.parse_args(argv)

    if args.probe and args.watermark:
        from .common import preflight_probe

        preflight_probe([args.watermark], args.codec_ckpt, args.codec_size,
                        args.sample_rate)

    if args.summarize_dir:
        summarize_quality_dir(args.summarize_dir)
        return

    from ..eval import evaluate_pair_batch, evaluate_pairs, make_pairs

    Path(args.out_csv).parent.mkdir(parents=True, exist_ok=True)
    if args.results_dir:
        pairs = make_pairs(args.results_dir)
        if not pairs:
            raise SystemExit(f"no wav pairs under {args.results_dir}")
        df = evaluate_pairs(pairs, sr=args.sample_rate)
    elif args.watermark:
        import pandas as pd

        needs_codec = args.watermark.startswith("semantic") or args.watermark == "token_green"
        codec = load_codec(args.codec_ckpt, args.codec_size) if needs_codec else None
        wm = build_watermarkers([args.watermark], codec, sample_rate=None if args.sample_rate == 16_000 else args.sample_rate)[args.watermark]
        # embed at the method's NATIVE rate (the reference embeds natively and
        # only the quality measurement resamples to 16 kHz,
        # evaluate_quality.py:20-27 — e.g. SilentCipher pairs are 44.1 kHz)
        wav = load_audio_batch(args.audio_glob, args.filecount, wm.sample_rate, args.seconds)
        key = jax.random.PRNGKey(0)
        msg = None
        if getattr(wm, "n_bits", 0) > 0:
            from ..models.base import random_message

            msg = random_message(key, wav.shape[0], wm.n_bits)
        # sub-batched embed: equal-size chunks (pad the tail by repeating the
        # last clip) so every chunk hits the same compiled executable
        bsz = max(1, min(args.embed_batch, wav.shape[0]))
        parts = []
        for i in range(0, wav.shape[0], bsz):
            w = wav[i:i + bsz]
            pad = bsz - w.shape[0]
            if pad:
                w = jax.numpy.concatenate([w, jax.numpy.repeat(w[-1:], pad, 0)], 0)
            if msg is not None:
                m = msg[i:i + bsz]
                if pad:
                    m = jax.numpy.concatenate([m, jax.numpy.repeat(m[-1:], pad, 0)], 0)
                mk = wm.embed(w, m, key)
            else:
                mk = wm.embed(w)
            parts.append(mk[:bsz - pad] if pad else mk)
        marked = jax.numpy.concatenate(parts, 0)
        cols = evaluate_pair_batch(wav, marked, wm.sample_rate, with_pesq=True)
        df = pd.DataFrame({"clean": [f"clip_{i}" for i in range(wav.shape[0])],
                           "watermarked": [args.watermark] * wav.shape[0],
                           "attack": "", "instrument": "speech",
                           **{k: v for k, v in cols.items()}})
    else:
        raise SystemExit("need --results_dir or --watermark")

    df.to_csv(args.out_csv, index=False)
    num = df.select_dtypes(include=[np.number])
    print(num.mean().to_string())


if __name__ == "__main__":
    main()
