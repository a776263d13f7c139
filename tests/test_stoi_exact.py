"""Exact host STOI (eval/stoi_exact.py): published-algorithm properties the
on-device approximation does not have (silent-frame removal, 10 kHz band)."""

import numpy as np
import pytest

from nawc_tpu.eval.stoi_exact import stoi_exact, stoi_exact_batch


def _speech_like(n, seed=0, sr=16_000):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(n) * 0.1
    env = np.abs(np.sin(np.arange(n) * 2 * np.pi * 3 / sr)) + 0.1
    return x * env


def test_identical_is_one():
    x = _speech_like(3 * 16_000)
    assert stoi_exact(x, x, 16_000) == pytest.approx(1.0, abs=1e-9)


def test_monotone_in_snr():
    x = _speech_like(3 * 16_000)
    rng = np.random.default_rng(1)
    noise = rng.standard_normal(len(x))
    rms = np.sqrt((x**2).mean())
    vals = [
        stoi_exact(x, x + noise * rms * 10 ** (-snr / 20.0), 16_000)
        for snr in (30, 15, 0)
    ]
    assert vals[0] > vals[1] > vals[2]
    assert vals[0] > 0.99


def test_silent_frames_removed():
    """Noise confined to a silent gap must not lower STOI: those frames are
    dropped by the clean-energy gate (the approximation keeps them)."""
    sr = 16_000
    x = np.concatenate([_speech_like(sr), np.zeros(sr), _speech_like(sr, 2)])
    y = x.copy()
    gap = slice(sr + sr // 4, sr + 3 * sr // 4)
    y[gap] += np.random.default_rng(3).standard_normal(sr // 2) * 1e-3
    assert stoi_exact(x, y, sr) > 0.999


def test_too_short_is_nan():
    x = _speech_like(1000)
    assert np.isnan(stoi_exact(x, x, 16_000))


def test_batch_matches_scalar():
    x = np.stack([_speech_like(2 * 16_000, s) for s in range(2)])
    y = x + 0.01 * np.random.default_rng(4).standard_normal(x.shape)
    b = stoi_exact_batch(x, y, 16_000)
    assert b.shape == (2,)
    assert b[0] == pytest.approx(stoi_exact(x[0], y[0], 16_000))


def test_24k_input_resampled():
    sr = 24_000
    x = _speech_like(3 * sr, sr=sr)
    v = stoi_exact(x, x + 1e-4 * np.random.default_rng(5).standard_normal(len(x)), sr)
    assert 0.9 < v <= 1.0
