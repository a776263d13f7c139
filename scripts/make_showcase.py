"""Generate the end-to-end showcase results tree with the trained codec.

Runs every analysis pipeline the framework provides against real speech and
collects artifacts under results/showcase/.  Run on the TPU host once a
codec checkpoint exists:

  python scripts/make_showcase.py [--quick]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="fewer files (CPU smoke)")
    ap.add_argument("--out", default="results/showcase")
    ap.add_argument("--ckpt", default="checkpoints/codec_24k.msgpack")
    args = ap.parse_args()

    n = 4 if args.quick else 16
    out = Path(args.out)
    t0 = time.time()

    from nawc_tpu.cli import ablation, benchmark, eval_codec, manifold, pgd, quality, robustness, uncertainty

    def run(name, fn, argv):
        t = time.time()
        print(f"\n=== showcase: {name} ===", flush=True)
        fn(argv)
        print(f"=== {name} done in {time.time() - t:.0f}s ===", flush=True)

    run("eval_codec", eval_codec.main, ["--ckpt", args.ckpt, "--filecount", str(n)])
    run("benchmark", benchmark.main, [
        "--mode", "both", "--watermarks", "spread_spectrum", "chunked", "psychoacoustic",
        "--filecount", str(n), "--codec_ckpt", args.ckpt,
        "--out_dir", str(out / "benchmark"), "--artifacts", "2",
    ])
    run("benchmark_semantic", benchmark.main, [
        "--mode", "both", "--watermarks", "semantic_pca", "semantic_cluster",
        "semantic_random", "token_green",
        "--filecount", str(min(n, 8)), "--seconds", "1.4",
        "--sample_rate", "24000", "--codec_ckpt", args.ckpt,
        "--out_dir", str(out / "benchmark_semantic"),
    ])
    run("robustness", robustness.main, [
        "--watermark", "spread_spectrum", "--filecount", str(n),
        "--codec_ckpt", args.ckpt, "--out_dir", str(out / "robustness"), "--resume",
    ])
    run("manifold", manifold.main, [
        "--watermarks", "spread_spectrum", "semantic_cluster",
        "--filecount", str(min(n, 8)), "--seconds", "1.4",
        "--codec_ckpt", args.ckpt, "--out_dir", str(out / "manifold"),
    ])
    run("ablation", ablation.main, [
        "--watermarks", "spread_spectrum", "--filecount", str(min(n, 8)),
        "--codec_ckpt", args.ckpt, "--out_dir", str(out / "ablation"),
    ])
    run("uncertainty", uncertainty.main, [
        "--watermark", "spread_spectrum", "--filecount", str(n),
        "--out_dir", str(out / "uncertainty"),
    ])
    run("quality", quality.main, [
        "--watermark", "spread_spectrum", "--filecount", str(n),
        "--out_csv", str(out / "quality" / "SpreadSpectrum_quality_results.csv"),
    ])
    run("pgd_exp_b", pgd.main, [
        "--mode", "exp_b", "--filecount", str(min(n, 8)),
        "--codec_ckpt", args.ckpt, "--out_dir", str(out / "pgd"),
    ])
    run("pgd_interp", pgd.main, [
        "--mode", "interp", "--filecount", str(min(n, 4)), "--steps", "30",
        "--codec_ckpt", args.ckpt, "--out_dir", str(out / "pgd"),
    ])
    print(f"\nshowcase complete in {time.time() - t0:.0f}s -> {out}")


if __name__ == "__main__":
    main()
