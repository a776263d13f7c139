"""CSV/PNG artifact writers with the reference's output contracts.

The reference persists: per-run CSVs (``qwen_benchmark_results.csv``
``watermark_testing.py:853-854``; ``detector_checker_results.csv`` ``:942``),
per-clip artifact WAVs + a 6-panel comparison plot (``save_artifacts``,
``:682-750``), heatmaps/bars for ablation (``run_snac_layer_ablation_plot
.py``), and quality CSVs (``evaluate_quality.py:80-115``).  Same artifact
shapes here; outputs always go to an explicit out_dir (the reference wrote
detector results into the INPUT audio dir — quirk not replicated,
SURVEY.md §7.4)."""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..utils import audio_io


def save_artifacts(
    out_dir: str | Path,
    name: str,
    clean: np.ndarray,
    marked: np.ndarray,
    attacked: np.ndarray,
    sr: int,
) -> None:
    """Three WAVs + 6-panel comparison PNG per clip (``:682-750``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out = Path(out_dir) / name
    out.mkdir(parents=True, exist_ok=True)
    audio_io.write_wav(out / "1_original.wav", clean, sr)
    audio_io.write_wav(out / "2_watermarked.wav", marked, sr)
    audio_io.write_wav(out / "3_attacked.wav", attacked, sr)

    fig, axes = plt.subplots(3, 2, figsize=(12, 8))
    for row, (sig, title) in enumerate(
        [(clean, "original"), (marked, "watermarked"), (attacked, "attacked")]
    ):
        sig = np.asarray(sig).ravel()
        axes[row, 0].plot(sig[:: max(len(sig) // 4000, 1)], linewidth=0.5)
        axes[row, 0].set_title(f"{title} waveform")
        f = np.abs(np.fft.rfft(sig))
        axes[row, 1].semilogy(np.maximum(f[:: max(len(f) // 4000, 1)], 1e-8), linewidth=0.5)
        axes[row, 1].set_title(f"{title} spectrum")
    fig.tight_layout()
    fig.savefig(out / "comparison.png", dpi=80)
    plt.close(fig)


def plot_ablation_heatmap(df, out_path: str | Path) -> None:
    """Mask x watermark heatmap (``run_snac_layer_ablation_plot.py:62-95``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pivot = df.pivot_table(index="mask", columns="watermark", values="score", aggfunc="mean")
    fig, ax = plt.subplots(figsize=(2 + pivot.shape[1] * 1.5, 1 + pivot.shape[0] * 0.6))
    im = ax.imshow(pivot.values, aspect="auto", cmap="viridis")
    ax.set_xticks(range(pivot.shape[1]), pivot.columns, rotation=30, ha="right")
    ax.set_yticks(range(pivot.shape[0]), pivot.index)
    for i in range(pivot.shape[0]):
        for j in range(pivot.shape[1]):
            ax.text(j, i, f"{pivot.values[i, j]:.2f}", ha="center", va="center", fontsize=8, color="w")
    fig.colorbar(im, ax=ax, label="score")
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(out_path, dpi=100)
    plt.close(fig)


def plot_survival_bars(df, out_path: str | Path) -> None:
    """Per-attack survival-rate bars per watermark (reference's summary
    plots, ``plot_feature_importance.py:19-35`` style)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pivot = df[df.clip_index >= 0].pivot_table(
        index="attack", columns="watermark", values="survived", aggfunc="mean"
    )
    ax = pivot.plot.bar(figsize=(max(6, len(pivot) * 0.5), 4))
    ax.set_ylabel("survival rate")
    ax.set_ylim(0, 1.05)
    ax.legend(fontsize=7)
    fig = ax.get_figure()
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(out_path, dpi=100)
    plt.close(fig)


def plot_variance_boxplots(df, out_path: str | Path, group_col: str = "attack_type", var_col: str = "mc_var_prob") -> None:
    """Per-group MC-variance boxplots (``analyze_uncertainty.py:155-167``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    groups = sorted(df[group_col].dropna().unique()) if group_col in df else ["all"]
    data = [df[df[group_col] == g][var_col].dropna() for g in groups] if group_col in df else [df[var_col].dropna()]
    fig, ax = plt.subplots(figsize=(max(5, 0.6 * len(groups)), 4))
    ax.boxplot(data, tick_labels=[str(g) for g in groups])
    ax.set_ylabel(var_col)
    plt.setp(ax.get_xticklabels(), rotation=40, ha="right", fontsize=7)
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(out_path, dpi=100)
    plt.close(fig)


def plot_metric_boxplots(df, out_path: str | Path, group_col: str = "attack_type", metric_col: str = "sisnr_attack") -> None:
    """Per-attack metric boxplots (``plot_feature_importance.py:38-57``)."""
    plot_variance_boxplots(df, out_path, group_col, metric_col)


def quality_results_frame(clean_paths, marked_paths, metrics_rows):
    """Rows matching audio_quality_check/*_quality_results.csv columns:
    clean,watermarked,attack,instrument,si_snr_clean,si_snr_watermarked,
    delta_si_snr,snr,lsd,pesq,stoi (header seen in the checked-in CSVs)."""
    import pandas as pd

    rows = []
    for cp, mp, m in zip(clean_paths, marked_paths, metrics_rows):
        rows.append({
            "clean": cp, "watermarked": mp, "attack": "", "instrument": "speech",
            **m,
        })
    return pd.DataFrame(rows)
