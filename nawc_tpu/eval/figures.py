"""Reference-parity figures the round-1 reporting pass was missing.

Each function renders one of the PNGs the reference publishes, from the
same data the in-repo pipelines already compute:
  * manifold global ΔWM-vs-ΔATT scatter, 3-D trajectory scatter, Δ bars
    (``run_manifold_analysis_all.py:254-322``) + per-file projection
    triplets (``:204-230``)
  * ablation per-WM bar charts (``run_snac_layer_ablation_plot.py:98-121``)
  * uncertainty variance histograms correct-vs-wrong + variance→error ROC
    (``analyze_uncertainty.py:100-133``) and the reliability curve
    (``:135-152``)
  * watermark-residual SNR histogram + spectral-footprint band boxplot
    (``analyze_perturbation.py:18-85``)
  * PGD dual-axis detection-vs-SNR chart (``attack_baselines.py:219-252``)
    and the Exp-C SNR-vs-detection scatter
    (``experiment_c_attack_comparison.py:272-299``)

All matplotlib, Agg backend, pure host-side post-processing of CSV-shaped
frames — no device work happens here.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _save(fig, out_path: str | Path) -> None:
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(out_path, dpi=100)
    import matplotlib.pyplot as plt

    plt.close(fig)


# ------------------------------------------------------------ manifold


def plot_manifold_global(df, out_dir: str | Path, dataset: str = "all") -> list[Path]:
    """Global manifold summary: Δ scatter, 3-D scatter, Δ bars
    (``run_manifold_analysis_all.py:254-322``).  `df` is the
    ``run_manifold_analysis`` frame (columns watermark, clean/wm/att
    _proj_mean, delta_wm, delta_att)."""
    plt = _plt()
    out_dir = Path(out_dir)
    saved = []

    # ΔWM vs ΔATT scatter with the y=-x "full removal" guide line
    fig, ax = plt.subplots(figsize=(6, 6))
    for name, sub in df.groupby("watermark"):
        ax.scatter(sub["delta_wm"], sub["delta_att"], alpha=0.6, label=name, s=20)
    ax.axhline(0.0, color="gray", linewidth=1, linestyle="--")
    ax.axvline(0.0, color="gray", linewidth=1, linestyle="--")
    xs = np.linspace(df["delta_wm"].min(), df["delta_wm"].max(), 100)
    ax.plot(xs, -xs, color="black", linewidth=1, linestyle=":")
    ax.set_xlabel("ΔWM = wm_proj_mean - clean_proj_mean")
    ax.set_ylabel("ΔATT = att_proj_mean - wm_proj_mean")
    ax.set_title(f"ΔWM vs ΔATT (all WMs, {dataset})")
    ax.legend(fontsize=8)
    p = out_dir / f"manifold_global_delta_{dataset}.png"
    _save(fig, p)
    saved.append(p)

    # 3-D clean -> wm -> att scatter
    fig = plt.figure(figsize=(7, 6))
    ax3 = fig.add_subplot(111, projection="3d")
    for name, sub in df.groupby("watermark"):
        ax3.scatter(
            sub["clean_proj_mean"], sub["wm_proj_mean"], sub["att_proj_mean"],
            alpha=0.6, label=name, s=20,
        )
    ax3.set_xlabel("clean_proj_mean")
    ax3.set_ylabel("wm_proj_mean")
    ax3.set_zlabel("att_proj_mean")
    ax3.set_title(f"Manifold (clean→wm→att) ({dataset})")
    ax3.legend(fontsize=8)
    p = out_dir / f"manifold_global_3d_{dataset}.png"
    _save(fig, p)
    saved.append(p)

    # mean Δ bars per watermark
    stats = df.groupby("watermark")[["delta_wm", "delta_att"]].mean()
    fig, ax = plt.subplots(figsize=(8, 4))
    x = np.arange(len(stats.index))
    width = 0.35
    ax.bar(x - width / 2, stats["delta_wm"], width, label="ΔWM")
    ax.bar(x + width / 2, stats["delta_att"], width, label="ΔATT")
    ax.set_xticks(x)
    ax.set_xticklabels(stats.index, rotation=20)
    ax.set_ylabel("mean projection difference")
    ax.set_title(f"Mean Δ per watermark ({dataset})")
    ax.legend()
    p = out_dir / f"manifold_global_delta_bar_{dataset}.png"
    _save(fig, p)
    saved.append(p)
    return saved


def plot_proj_triplet(
    out_path: str | Path,
    proj_clean: np.ndarray,
    proj_wm: np.ndarray,
    proj_att: np.ndarray,
    wm_name: str,
) -> None:
    """Per-file clean/wm/attacked projection trajectories
    (``run_manifold_analysis_all.py:204-230``)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(10, 4))
    for sig, label in ((proj_clean, "clean"), (proj_wm, "watermarked"), (proj_att, "attacked")):
        ax.plot(np.arange(len(sig)), np.asarray(sig), label=label, alpha=0.7)
    ax.legend()
    ax.set_title(f"Projection along WM axis ({wm_name})")
    ax.set_xlabel("latent time index")
    ax.set_ylabel("projection value")
    _save(fig, out_path)


# ------------------------------------------------------------ ablation


def _order_masks(masks: list[str]) -> list[str]:
    """full_all first, then drop_last_k ascending, then keep_only_i
    (``run_snac_layer_ablation_plot.py:40-59``)."""
    def keyfn(m: str):
        if m == "full_all":
            return (0, 0)
        if m.startswith("drop_last_"):
            return (1, int(m.rsplit("_", 1)[1]))
        if m.startswith("keep_only_"):
            return (2, int(m.rsplit("_", 1)[1]))
        return (3, 0)

    return sorted(masks, key=keyfn)


def plot_ablation_per_wm_bars(df, out_dir: str | Path) -> list[Path]:
    """One bar chart per watermark: mask (ordered) vs mean score
    (``run_snac_layer_ablation_plot.py:98-121``)."""
    plt = _plt()
    out_dir = Path(out_dir)
    saved = []
    grouped = df.groupby(["watermark", "mask"])["score"].mean().reset_index()
    for wm_name, sub in grouped.groupby("watermark"):
        masks = _order_masks(sub["mask"].tolist())
        sub = sub.set_index("mask").reindex(masks).reset_index()
        fig, ax = plt.subplots(figsize=(10, 4))
        ax.bar(sub["mask"], sub["score"])
        plt.setp(ax.get_xticklabels(), rotation=45, ha="right")
        ax.set_ylabel("mean score")
        ax.set_title(f"Codec layer ablation - {wm_name}")
        p = out_dir / f"snac_layer_ablation_{wm_name}.png"
        _save(fig, p)
        saved.append(p)
    return saved


# ------------------------------------------------------------ uncertainty


def plot_uncertainty_hist(df, out_path: str | Path, var_col: str = "mc_var_prob") -> None:
    """Variance histograms, correct vs wrong predictions
    (``analyze_uncertainty.py:100-115``)."""
    plt = _plt()
    correct = df["correct"].astype(bool).values
    v = df[var_col].values
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.hist(v[correct], bins=50, alpha=0.6, label="correct", density=True)
    if (~correct).any():
        ax.hist(v[~correct], bins=50, alpha=0.6, label="wrong", density=True)
    ax.set_xlabel(var_col)
    ax.set_ylabel("density")
    ax.set_title(f"{var_col}: correct vs wrong")
    ax.legend()
    _save(fig, out_path)


def plot_uncertainty_roc(df, out_path: str | Path, var_col: str = "mc_var_prob") -> float:
    """ROC of variance as a wrong-prediction predictor
    (``analyze_uncertainty.py:117-133``).  Returns the AUC."""
    plt = _plt()
    y = (~df["correct"].astype(bool).values).astype(int)
    v = np.asarray(df[var_col].values, np.float64)
    order = np.argsort(-v)  # descending variance = most suspicious first
    y_sorted = y[order]
    tpr = np.concatenate([[0], np.cumsum(y_sorted) / max(y.sum(), 1)])
    fpr = np.concatenate([[0], np.cumsum(1 - y_sorted) / max((1 - y).sum(), 1)])
    auc = float(np.trapezoid(tpr, fpr))
    fig, ax = plt.subplots(figsize=(4, 4))
    ax.plot(fpr, tpr, label=f"AUC={auc:.3f}")
    ax.plot([0, 1], [0, 1], "k--")
    ax.set_xlabel("False Positive Rate")
    ax.set_ylabel("True Positive Rate")
    ax.set_title(f"ROC: {var_col} as uncertainty score")
    ax.legend(loc="lower right")
    _save(fig, out_path)
    return auc


def plot_reliability_curve(prob_bin, accuracy, out_path: str | Path) -> None:
    """Calibration curve from binned MC mean probs
    (``analyze_uncertainty.py:135-152``)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(4, 4))
    mask = ~np.isnan(np.asarray(accuracy, np.float64))
    ax.plot(np.asarray(prob_bin)[mask], np.asarray(accuracy)[mask], "o-")
    ax.plot([0, 1], [0, 1], "k--")
    ax.set_xlabel("predicted probability (bin mean)")
    ax.set_ylabel("empirical accuracy")
    ax.set_title("Reliability curve (MC mean prob)")
    _save(fig, out_path)


# ------------------------------------------------------------ perturbation


def plot_snr_histogram(snrs_db: np.ndarray, out_path: str | Path) -> None:
    """Watermark-residual SNR distribution
    (``analyze_perturbation.py:60-66``)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(8, 6))
    ax.hist(np.asarray(snrs_db), bins=min(50, max(5, len(snrs_db) // 2)), color="skyblue", edgecolor="black")
    ax.set_title("Distribution of Watermark SNR")
    ax.set_xlabel("SNR (dB)")
    ax.set_ylabel("count")
    _save(fig, out_path)


def plot_spectral_footprint(band_energy: np.ndarray, out_path: str | Path) -> None:
    """Per-frequency-band residual-energy boxplot
    (``analyze_perturbation.py:68-82``).  `band_energy` is (N, n_bands)."""
    plt = _plt()
    e = 10.0 * np.log10(np.asarray(band_energy) + 1e-9)
    fig, ax = plt.subplots(figsize=(12, 6))
    ax.boxplot([e[:, i] for i in range(e.shape[1])], tick_labels=[str(i) for i in range(e.shape[1])])
    ax.set_title("Watermark Spectral Footprint (Residual Energy per Band)")
    ax.set_xlabel("Frequency Band Index (Low -> High)")
    ax.set_ylabel("Log Energy (dB)")
    _save(fig, out_path)


# ------------------------------------------------------------ PGD


def plot_detection_vs_snr(df, out_path: str | Path, title: str = "Attack comparison") -> None:
    """Dual-axis chart: detection-prob bars (left) + SNR line (right) per
    attack (``attack_baselines.py:219-252``).  `df` columns: attack, score,
    snr_db."""
    plt = _plt()
    labels = df["attack"].tolist()
    x = np.arange(len(labels))
    fig, ax1 = plt.subplots(figsize=(12, 6))
    ax1.bar(x - 0.175, df["score"], 0.35, label="Detection Prob", color="skyblue", edgecolor="black")
    ax1.set_ylabel("Watermark Detection Probability", color="blue")
    ax1.set_ylim(0, 1.1)
    ax1.axhline(0.5, color="gray", linestyle="--", label="Random Guess")
    ax1.set_xticks(x)
    ax1.set_xticklabels(labels, rotation=30, ha="right")
    ax2 = ax1.twinx()
    ax2.plot(x, df["snr_db"], color="red", marker="o", linewidth=2, label="Audio SNR (dB)")
    ax2.set_ylabel("Audio Quality (SNR dB)", color="red")
    ax1.set_title(title)
    _save(fig, out_path)


def plot_pgd_scatter(per_clip: dict[str, tuple[np.ndarray, np.ndarray]], out_path: str | Path) -> None:
    """SNR-vs-detection scatter comparing PGD variants
    (``experiment_c_attack_comparison.py:272-299``).  `per_clip` maps
    method name -> (snrs, probs) arrays."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(10, 7))
    styles = [("red", "x"), ("green", "o"), ("blue", "s"), ("orange", "^")]
    for (name, (snrs, probs)), (color, marker) in zip(per_clip.items(), styles):
        ax.scatter(
            np.asarray(snrs), np.asarray(probs), color=color, marker=marker,
            label=f"{name} (avg SNR: {np.mean(snrs):.1f} dB)", alpha=0.7, s=80,
        )
    ax.axhline(0.5, color="gray", linestyle="--", label="Random Guess (0.5)")
    ax.set_xlabel("Audio Quality (SNR dB) -> higher is better")
    ax.set_ylabel("Watermark Detection Probability -> lower is better")
    ax.set_title("Attack Comparison: Standard vs Subspace-Constrained PGD")
    ax.legend()
    ax.grid(True, alpha=0.3)
    _save(fig, out_path)
