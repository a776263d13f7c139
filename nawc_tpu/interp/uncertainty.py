"""Monte-Carlo uncertainty of detectors + calibration analysis.

TPU rebuild of ``run_uncertainty_eval.py`` / ``analyze_uncertainty.py``:
the reference re-runs the detector 20x per clip with Gaussian input noise
sigma=0.001 in a Python loop (``monte_carlo_inference``, ``:36-85``); here
the MC axis is vmapped into the batch, so all samples of all clips are one
device call.  Downstream: reliability (calibration) curve (``:20-39``),
ROC of variance-predicts-errors (``:120-133``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def monte_carlo_scores(
    score_fn: Callable[[jnp.ndarray], jnp.ndarray],
    wav: jnp.ndarray,
    key: jax.Array,
    n_samples: int = 20,
    sigma: float = 1e-3,
) -> jnp.ndarray:
    """(B, T) -> (n_samples, B) scores under input Gaussian noise."""
    noise = jax.random.normal(key, (n_samples,) + wav.shape) * sigma
    return jax.lax.map(lambda n: score_fn(wav + n), noise)


def mc_statistics(
    score_fn,
    wav: jnp.ndarray,
    key: jax.Array,
    labels: np.ndarray | None = None,
    n_samples: int = 20,
    sigma: float = 1e-3,
    threshold: float = 0.5,
) -> dict[str, np.ndarray]:
    """Per-clip mc_mean_prob / mc_var_prob / correct@threshold (the
    reference's output columns, ``run_uncertainty_eval.py:248-268``)."""
    scores = np.asarray(monte_carlo_scores(score_fn, wav, key, n_samples, sigma))
    out = {
        "mc_mean_prob": scores.mean(axis=0),
        "mc_var_prob": scores.var(axis=0),
    }
    if labels is not None:
        pred = (out["mc_mean_prob"] > threshold).astype(np.int32)
        out["correct"] = (pred == np.asarray(labels)).astype(np.int32)
    return out


def reliability_curve(probs: np.ndarray, labels: np.ndarray, n_bins: int = 10):
    """Calibration curve (``analyze_uncertainty.py:20-39``): per-prob-bin
    (mean predicted prob, empirical accuracy, count)."""
    probs = np.asarray(probs)
    labels = np.asarray(labels)
    edges = np.linspace(0.0, 1.0, n_bins + 1)
    centers, accs, counts = [], [], []
    for i in range(n_bins):
        m = (probs >= edges[i]) & (probs < edges[i + 1] if i < n_bins - 1 else probs <= edges[i + 1])
        if m.sum() == 0:
            continue
        centers.append(probs[m].mean())
        accs.append(labels[m].mean())
        counts.append(int(m.sum()))
    return np.array(centers), np.array(accs), np.array(counts)


def variance_error_auc(variances: np.ndarray, correct: np.ndarray) -> float:
    """Does MC variance predict errors?  AUC of var as a score for
    (1 - correct) (``analyze_uncertainty.py:120-133``)."""
    v = np.asarray(variances, dtype=np.float64)
    err = 1 - np.asarray(correct)
    if err.min() == err.max():
        return float("nan")
    order = np.argsort(v)
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(v) + 1)
    n1 = err.sum()
    n0 = len(err) - n1
    return float((ranks[err == 1].sum() - n1 * (n1 + 1) / 2) / (n0 * n1))


def expected_calibration_error(probs: np.ndarray, labels: np.ndarray, n_bins: int = 10) -> float:
    centers, accs, counts = reliability_curve(probs, labels, n_bins)
    if len(counts) == 0:
        return float("nan")
    w = counts / counts.sum()
    return float(np.sum(w * np.abs(accs - centers)))
