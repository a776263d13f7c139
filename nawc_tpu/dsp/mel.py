"""Mel filterbank (Slaney-style) and log-mel spectrograms.

The matrix is built host-side in numpy at trace time (static), applied as a
single matmul -> MXU-friendly.  Used by the codec's multi-scale mel
reconstruction loss and the BASELINE config #1 round-trip check.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import MelConfig, StftConfig
from .stft import spectrogram


def hz_to_mel(f: np.ndarray | float) -> np.ndarray:
    """Slaney mel scale (linear below 1 kHz, log above)."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, f / f_sp)


def mel_to_hz(m: np.ndarray | float) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), f_sp * m)


@functools.lru_cache(maxsize=32)
def _mel_matrix_np(cfg: MelConfig) -> np.ndarray:
    """(n_bins, n_mels) triangular filterbank with Slaney area normalization.

    Cached as NUMPY on purpose: caching a jnp array created inside a jit
    trace would store a tracer and poison later traces."""
    fmax = cfg.fmax if cfg.fmax is not None else cfg.sample_rate / 2
    n_bins = cfg.n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, cfg.sample_rate / 2, n_bins)
    mel_pts = np.linspace(hz_to_mel(cfg.fmin), hz_to_mel(fmax), cfg.n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    fb = np.zeros((n_bins, cfg.n_mels))
    for i in range(cfg.n_mels):
        lo, ctr, hi = hz_pts[i], hz_pts[i + 1], hz_pts[i + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-10)
        fb[:, i] = np.maximum(0.0, np.minimum(up, down))
        enorm = 2.0 / (hi - lo)
        fb[:, i] *= enorm
    return fb.astype(np.float32)


def mel_matrix(cfg: MelConfig) -> jnp.ndarray:
    """(n_bins, n_mels) filterbank as a jnp array (fresh per call site)."""
    return jnp.asarray(_mel_matrix_np(cfg))


@functools.partial(jax.jit, static_argnames=("stft_cfg", "mel_cfg", "log"))
def mel_spectrogram(
    x: jnp.ndarray,
    stft_cfg: StftConfig = StftConfig(),
    mel_cfg: MelConfig = MelConfig(),
    log: bool = True,
) -> jnp.ndarray:
    """(..., T) -> (..., n_frames, n_mels) (log-)mel power spectrogram."""
    power = spectrogram(x, stft_cfg, power=2.0)
    mels = power @ mel_matrix(mel_cfg)
    if log:
        mels = jnp.log(jnp.maximum(mels, 1e-5))
    return mels
