"""Stats aggregation + feature-importance CLI (the reference's
``compute_watermark_stats.py``, ``run_feature_importance.py``,
``plot_feature_importance.py``).

Usage:
  python -m nawc_tpu.cli.stats --results results/robustness/test_results.csv \
      --target 'bitwise/distorted' --out_dir results/stats
"""

from __future__ import annotations

import argparse
from pathlib import Path


def load_table(path: str):
    """Delimiter auto-detection like the reference (``run_feature_importance
    .py:11-16``): try pipe first (raw_bench convention), fall back to comma."""
    import pandas as pd

    df = pd.read_csv(path, sep="|")
    if df.shape[1] == 1:
        df = pd.read_csv(path)
    return df


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--results", required=True, help="per-chunk results CSV (pipe or comma)")
    ap.add_argument("--group", nargs="+", default=["attack_type"])
    ap.add_argument("--target", default="bitwise/distorted")
    ap.add_argument("--top_k", type=int, default=15)
    ap.add_argument("--out_dir", default="results/stats")
    args = ap.parse_args(argv)

    from ..interp import agg_stats, compute_feature_importance

    df = load_table(args.results)
    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)

    stats = agg_stats(df, [g for g in args.group if g in df.columns])
    stats.to_csv(out / "stats_by_group.csv", index=False)

    overall = df.copy()
    overall["_all"] = 0
    agg_stats(overall, ["_all"]).drop(columns=["_all"]).to_csv(out / "overall_stats.csv", index=False)

    if args.target in df.columns:
        imp = compute_feature_importance(df, args.target)
        imp.to_csv(out / "feature_importance.csv", index=False)
        # top-K bar plot (plot_feature_importance.py:60-74)
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        top = imp.head(args.top_k)
        fig, ax = plt.subplots(figsize=(7, max(3, 0.3 * len(top))))
        ax.barh(top.feature[::-1], top.pearson[::-1])
        ax.set_xlabel(f"pearson correlation with {args.target}")
        fig.tight_layout()
        fig.savefig(out / "feature_importance.png", dpi=100)
        plt.close(fig)
        print(imp.head(args.top_k).to_string(index=False))
    else:
        print(f"[stats] target {args.target!r} not in columns; wrote group stats only")
    print(f"[stats] wrote {out}")


if __name__ == "__main__":
    main()
