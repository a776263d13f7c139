"""PESQ proxy (eval/pesq_proxy.py): range, identity, monotonicity under
growing distortion, rate handling, and the pesq_host dispatch."""

import numpy as np
import pytest

from nawc_tpu.eval.metrics import pesq_host, pesq_impl
from nawc_tpu.eval.pesq_proxy import bark_disturbance, pesq_proxy


def _speechlike(n=32000, sr=16000, seed=0):
    """Harmonic + noise burst signal with speech-ish envelope."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    f0 = 120 + 30 * np.sin(2 * np.pi * 1.3 * t)
    x = sum(np.sin(2 * np.pi * k * np.cumsum(f0) / sr) / k for k in range(1, 6))
    env = 0.5 * (1 + np.sin(2 * np.pi * 2.7 * t)) + 0.05
    return (x * env + 0.01 * rng.standard_normal(n)).astype(np.float64)


def test_identity_scores_max():
    x = _speechlike()
    assert pesq_proxy(x, x, 16000) > 4.55


def test_monotone_under_noise():
    x = _speechlike()
    rng = np.random.default_rng(1)
    noise = rng.standard_normal(x.size)
    scores = [
        pesq_proxy(x, x + lvl * noise * np.std(x), 16000)
        for lvl in (0.0, 0.03, 0.1, 0.3)
    ]
    assert all(a >= b - 1e-9 for a, b in zip(scores, scores[1:])), scores
    assert scores[0] - scores[-1] > 0.5  # heavy noise clearly penalized
    assert all(1.0 <= s <= 4.64 for s in scores)


def test_gain_and_mild_filtering_forgiven():
    """Level changes and mild linear filtering should barely move the
    score (PESQ-style gain compensation)."""
    x = _speechlike()
    assert pesq_proxy(x, 0.5 * x, 16000) > 4.5
    y = np.convolve(x, [0.9, 0.1], mode="same")
    assert pesq_proxy(x, y, 16000) > 4.0


def test_resamples_other_rates():
    x = _speechlike(48000, 24000)
    s = pesq_proxy(x, x + 0.001 * np.std(x) * np.random.default_rng(2).standard_normal(x.size), 24000)
    assert 3.5 < s <= 4.64


def test_asym_feature_fires_on_additive_noise():
    x = _speechlike()
    rng = np.random.default_rng(3)
    _, _, da_clean = bark_disturbance(x, x, 16000)
    _, _, da_noisy = bark_disturbance(x, x + 0.2 * np.std(x) * rng.standard_normal(x.size), 16000)
    assert da_noisy > da_clean + 1e-4


def test_pesq_host_fills_column():
    """With the ITU package absent, pesq_host must fall back to the proxy
    and return a real value (VERDICT r2 missing #3: no more empty pesq
    columns)."""
    x = _speechlike()
    v = pesq_host(x, x + 0.05 * np.std(x) * np.random.default_rng(4).standard_normal(x.size), 16000)
    assert np.isfinite(v) and 1.0 <= v <= 4.64
    assert pesq_impl() in ("itu", "proxy")
