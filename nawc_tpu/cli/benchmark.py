"""Survivability benchmark CLI (the reference's main entry,
``watermark_testing.py --mode {benchmark,detector,both}``, ``:954-1021``).

Usage:
  python -m nawc_tpu.cli.benchmark --mode both \
      --audio_glob '/root/reference/dataset/LibriSpeech/*.wav' \
      --watermarks spread_spectrum chunked --filecount 16 --out_dir results/
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax


def _error_only_methods(df, requested) -> list[str]:
    """Methods whose every result row is an ERROR row.  The benchmark must
    fail loudly instead of committing error CSVs as parity evidence
    (ADVICE r2: round-2's MosaicError rows shipped silently)."""
    if "error" not in df.columns:
        return []
    bad = []
    for name in requested:
        sub = df[df.watermark == name]
        if len(sub) and sub["error"].notna().all():
            print(f"[benchmark] FATAL: every row for {name!r} is an ERROR row; "
                  f"first error: {sub['error'].iloc[0]}")
            bad.append(name)
    return bad


def main(argv=None) -> None:
    from .common import DEFAULT_AUDIO_GLOB, WM_CHOICES, build_watermarkers, load_audio_batch, load_codec

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", choices=["benchmark", "detector", "both"], default="both")
    ap.add_argument("--audio_glob", default=DEFAULT_AUDIO_GLOB)
    ap.add_argument("--data_root", default=None,
                    help="root with per-dataset subdirs of wavs; with --datasets, "
                         "runs the whole benchmark per dataset (the reference's "
                         "multi-dataset loop, watermark_testing.py:970-1021)")
    ap.add_argument("--datasets", nargs="*", default=None)
    ap.add_argument("--watermarks", nargs="+", default=["spread_spectrum"], choices=WM_CHOICES)
    ap.add_argument("--filecount", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--sample_rate", type=int, default=16_000)
    ap.add_argument("--attacks", nargs="*", default=None,
                    help="attack names (default: full suite incl. codec roundtrip)")
    ap.add_argument("--codec_ckpt", default="checkpoints/codec_24k.msgpack")
    ap.add_argument("--codec_size", choices=["full", "small"], default="full")
    ap.add_argument("--out_dir", default="results")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--artifacts", type=int, default=0, help="save N artifact triplets")
    ap.add_argument("--probe", action="store_true",
                    help="preflight each watermark at n=2 x 1 s in a disposable "
                         "subprocess before the full-scale stage (crash guard; "
                         "VERDICT r3 #8)")
    args = ap.parse_args(argv)

    if args.probe:
        from .common import preflight_probe

        preflight_probe(args.watermarks, args.codec_ckpt, args.codec_size,
                        args.sample_rate)

    from ..attacks import build_suite
    from ..eval import run_combined, run_detector_checker, run_survivability
    from ..eval.reporting import plot_survival_bars, save_artifacts

    # multi-dataset mode: recurse once per dataset subdir with a clean argv
    if args.data_root and args.datasets:
        for ds in args.datasets:
            print(f"\n=== dataset {ds} ===")
            child = [
                "--mode", args.mode,
                "--watermarks", *args.watermarks,
                "--filecount", str(args.filecount),
                "--seconds", str(args.seconds),
                "--sample_rate", str(args.sample_rate),
                "--codec_ckpt", args.codec_ckpt,
                "--codec_size", args.codec_size,
                "--seed", str(args.seed),
                "--artifacts", str(args.artifacts),
                "--audio_glob", str(Path(args.data_root) / ds / "*.wav"),
                "--out_dir", str(Path(args.out_dir) / ds),
            ]
            if args.attacks:
                child += ["--attacks", *args.attacks]
            main(child)
        return

    needs_codec = any(w.startswith("semantic") for w in args.watermarks) or not args.attacks
    codec = load_codec(args.codec_ckpt, args.codec_size) if needs_codec else None
    sr = args.sample_rate
    wav = load_audio_batch(args.audio_glob, args.filecount, sr, args.seconds)
    wms = build_watermarkers(args.watermarks, codec, sample_rate=None if sr == 16_000 else sr)

    # group watermarkers by native rate: each method gets audio and attacks
    # at its own sample rate (the reference resamples inside each wrapper)
    from ..dsp.resample import resample as _resample

    groups: dict[int, dict[str, object]] = {}
    for name, wm in wms.items():
        groups.setdefault(wm.sample_rate, {})[name] = wm
    wav_at = {}
    for rate in groups:
        wav_at[rate] = wav if rate == sr else _resample(wav, sr, rate)

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)

    import pandas as pd

    if args.mode == "detector":
        df = pd.concat([run_detector_checker(g, wav_at[r], seed=args.seed)
                        for r, g in groups.items()], ignore_index=True)
        df.to_csv(out / "detector_checker_results.csv", index=False)
        print(df.groupby("watermark")["detector_works"].mean())
        if _error_only_methods(df, wms):
            raise SystemExit(2)
    elif args.mode == "benchmark":
        dfs = []
        for r, g in groups.items():
            suite = build_suite(r, codec)
            if args.attacks:
                suite = {k: suite[k] for k in args.attacks}
            dfs.append(run_survivability(g, suite, wav_at[r], seed=args.seed))
        df = pd.concat(dfs, ignore_index=True)
        df.to_csv(out / "qwen_benchmark_results.csv", index=False)
        plot_survival_bars(df, out / "survival_rates.png")
        print(df[df.clip_index >= 0].groupby(["watermark", "attack"])["survived"].mean())
        if _error_only_methods(df, wms):
            raise SystemExit(2)
    else:
        pers, summs = [], []
        for r, g in groups.items():
            suite = build_suite(r, codec)
            if args.attacks:
                suite = {k: suite[k] for k in args.attacks}
            rep = run_combined(g, suite, wav_at[r], seed=args.seed)
            pers.append(rep.per_method)
            summs.append(rep.summary)
        per_method = pd.concat(pers, ignore_index=True)
        summary = pd.concat(summs, ignore_index=True)
        per_method.to_csv(out / "combined_results.csv", index=False)
        summary.to_csv(out / "threshold_summary.csv", index=False)
        print(summary.to_string(index=False))
        if _error_only_methods(per_method, wms):
            raise SystemExit(2)

    if args.artifacts:
        import numpy as np

        from ..models.base import random_message

        key = jax.random.PRNGKey(args.seed)
        name, wm = next(iter(wms.items()))
        wav_a = wav_at[wm.sample_rate]  # artifact at the method's native rate
        attack = next(iter(build_suite(wm.sample_rate, codec).values()))
        if getattr(wm, "n_bits", 0) > 0:
            msg = random_message(key, wav_a.shape[0], wm.n_bits)
            marked = wm.embed(wav_a, msg, key)
        else:
            marked = wm.embed(wav_a)
        attacked = attack(marked, key)
        wav = wav_a
        sr = wm.sample_rate
        for i in range(min(args.artifacts, wav.shape[0])):
            save_artifacts(out / "artifacts", f"{name}_{i}", np.asarray(wav[i]),
                           np.asarray(marked[i]), np.asarray(attacked[i]), sr)


if __name__ == "__main__":
    main()
