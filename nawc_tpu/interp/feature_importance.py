"""Feature-importance correlation analysis + stats aggregation.

Rebuilds ``run_feature_importance.py`` (Pearson/Spearman of every numeric
column against a target metric, ranked by |pearson|, ``:19-60``) and
``compute_watermark_stats.py``'s ``agg_stats`` (group mean/std of all
numeric columns, ``:11-39``) on pandas DataFrames produced by our eval
runners (same schemas)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _rankdata(x: np.ndarray) -> np.ndarray:
    order = np.argsort(x)
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(x) + 1)
    # average ties
    _, inv, counts = np.unique(x, return_inverse=True, return_counts=True)
    sums = np.zeros(len(counts))
    np.add.at(sums, inv, ranks)
    return sums[inv] / counts[inv]


def compute_feature_importance(df: pd.DataFrame, target: str) -> pd.DataFrame:
    """-> DataFrame(feature, pearson, spearman, abs_pearson) sorted by
    |pearson| desc (``run_feature_importance.py:19-60``)."""
    num = df.select_dtypes(include=[np.number])
    if target not in num.columns:
        raise KeyError(f"target column {target!r} not numeric or missing")
    y = num[target].to_numpy(dtype=np.float64)
    rows = []
    for col in num.columns:
        if col == target:
            continue
        x = num[col].to_numpy(dtype=np.float64)
        m = np.isfinite(x) & np.isfinite(y)
        if m.sum() < 3 or x[m].std() == 0 or y[m].std() == 0:
            continue
        pearson = float(np.corrcoef(x[m], y[m])[0, 1])
        spearman = float(np.corrcoef(_rankdata(x[m]), _rankdata(y[m]))[0, 1])
        rows.append({"feature": col, "pearson": pearson, "spearman": spearman,
                     "abs_pearson": abs(pearson)})
    out = pd.DataFrame(rows)
    return out.sort_values("abs_pearson", ascending=False).reset_index(drop=True)


def agg_stats(df: pd.DataFrame, group_cols: list[str]) -> pd.DataFrame:
    """Group mean+std of all numeric columns with `<col>_mean`/`<col>_std`
    names and an `n` count column (``compute_watermark_stats.py:11-39``)."""
    num_cols = [c for c in df.select_dtypes(include=[np.number]).columns if c not in group_cols]
    g = df.groupby(group_cols)
    out = g[num_cols].agg(["mean", "std"])
    out.columns = [f"{c}_{stat}" for c, stat in out.columns]
    out.insert(0, "n", g.size())
    return out.reset_index()
