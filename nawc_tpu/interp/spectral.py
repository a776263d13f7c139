"""Spectral-footprint analysis of watermark residuals.

Rebuilds ``analyze_perturbation.py``: residual wm - clean -> SNR histogram +
per-frequency-band residual-energy distribution via STFT n_fft=2048
(``:10-16``), batched on-device."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.stft import spectrogram
from ..utils.config import StftConfig

_CFG = StftConfig(2048, 512, 2048)


@functools.partial(jax.jit, static_argnames=("n_bands",))
def band_energies(residual: jnp.ndarray, n_bands: int = 8) -> jnp.ndarray:
    """(B, T) residual -> (B, n_bands) mean energy per frequency band
    (``analyze_perturbation.py:10-16``)."""
    spec = spectrogram(residual, _CFG, power=2.0)  # (B, T', F)
    f = spec.shape[-1]
    width = f // n_bands
    spec = spec[..., : width * n_bands]
    bands = spec.reshape(spec.shape[:-1] + (n_bands, width))
    return jnp.mean(bands, axis=(-3, -1))


def residual_report(clean: jnp.ndarray, marked: jnp.ndarray, n_bands: int = 8) -> dict[str, np.ndarray]:
    """Per-clip SNR of the watermark residual + band-energy profile."""
    residual = marked - clean
    p_sig = jnp.sum(clean**2, axis=-1)
    p_res = jnp.sum(residual**2, axis=-1)
    snr = 10.0 * jnp.log10((p_sig + 1e-10) / (p_res + 1e-10))
    return {
        "snr_db": np.asarray(snr),
        "band_energy": np.asarray(band_energies(residual, n_bands)),
    }
