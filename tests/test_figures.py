"""Reference-parity figure writers: every plot function produces a PNG from
the CSV-shaped frames the pipelines emit (reporting-surface contract)."""

import numpy as np
import pandas as pd
import pytest

from nawc_tpu.eval import figures


@pytest.fixture()
def manifold_df(rng):
    n = 12
    return pd.DataFrame({
        "watermark": ["a"] * 6 + ["b"] * 6,
        "clean_proj_mean": rng.normal(size=n),
        "wm_proj_mean": rng.normal(size=n) + 1.0,
        "att_proj_mean": rng.normal(size=n) + 0.5,
        "delta_wm": rng.normal(size=n) + 1.0,
        "delta_att": rng.normal(size=n) - 0.5,
    })


def test_manifold_global_plots(manifold_df, tmp_path):
    saved = figures.plot_manifold_global(manifold_df, tmp_path, dataset="unit")
    assert len(saved) == 3
    for p in saved:
        assert p.exists() and p.stat().st_size > 0


def test_proj_triplet(tmp_path, rng):
    out = tmp_path / "sub" / "trip.png"
    figures.plot_proj_triplet(out, rng.normal(size=50), rng.normal(size=50), rng.normal(size=50), "wm")
    assert out.exists()


def test_ablation_bars_mask_order(tmp_path, rng):
    masks = ["keep_only_1", "full_all", "drop_last_2", "drop_last_1", "keep_only_0"]
    df = pd.DataFrame({
        "watermark": ["w"] * len(masks) * 2,
        "mask": masks * 2,
        "score": rng.uniform(size=len(masks) * 2),
    })
    assert figures._order_masks(masks) == [
        "full_all", "drop_last_1", "drop_last_2", "keep_only_0", "keep_only_1",
    ]
    saved = figures.plot_ablation_per_wm_bars(df, tmp_path)
    assert len(saved) == 1 and saved[0].exists()


def test_uncertainty_hist_and_roc(tmp_path, rng):
    n = 100
    correct = rng.uniform(size=n) > 0.3
    df = pd.DataFrame({
        "correct": correct.astype(int),
        # wrong predictions get systematically higher variance -> AUC > 0.5
        "mc_var_prob": rng.uniform(size=n) + (~correct) * 1.0,
    })
    figures.plot_uncertainty_hist(df, tmp_path / "hist.png")
    auc = figures.plot_uncertainty_roc(df, tmp_path / "roc.png")
    assert (tmp_path / "hist.png").exists() and (tmp_path / "roc.png").exists()
    assert auc > 0.8


def test_uncertainty_roc_auc_matches_rank_auc(rng, tmp_path):
    n = 200
    correct = rng.uniform(size=n) > 0.5
    var = rng.normal(size=n) + (~correct) * 0.7
    df = pd.DataFrame({"correct": correct.astype(int), "mc_var_prob": var})
    auc = figures.plot_uncertainty_roc(df, tmp_path / "roc.png")
    # independent rank-statistic AUC
    from nawc_tpu.eval.benchmark import detection_auc

    want = detection_auc(var, (~correct).astype(int))
    assert abs(auc - want) < 0.02


def test_reliability_curve(tmp_path):
    figures.plot_reliability_curve(
        np.linspace(0, 1, 10), np.linspace(0, 1, 10) ** 1.2, tmp_path / "rel.png"
    )
    assert (tmp_path / "rel.png").exists()


def test_perturbation_figures(tmp_path, rng):
    figures.plot_snr_histogram(rng.normal(25, 3, size=40), tmp_path / "snr.png")
    figures.plot_spectral_footprint(np.abs(rng.normal(size=(40, 16))), tmp_path / "foot.png")
    assert (tmp_path / "snr.png").exists() and (tmp_path / "foot.png").exists()


def test_pgd_figures(tmp_path, rng):
    df = pd.DataFrame({
        "attack": ["clean", "noise", "pca"],
        "score": [0.9, 0.6, 0.2],
        "snr_db": [90.0, 25.0, 10.0],
    })
    figures.plot_detection_vs_snr(df, tmp_path / "dual.png")
    figures.plot_pgd_scatter(
        {"standard": (rng.normal(20, 2, 8), rng.uniform(size=8)),
         "subspace": (rng.normal(25, 2, 8), rng.uniform(size=8))},
        tmp_path / "scatter.png",
    )
    assert (tmp_path / "dual.png").exists() and (tmp_path / "scatter.png").exists()
