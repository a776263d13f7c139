"""Audio-quality metrics, computed on-device and batched.

Reference definitions: SI-SNR (``audio_quality_check/evaluate_quality.py:29-37``),
SNR (``:39-43``), log-spectral distance (``:45-52``), optional PESQ/STOI
(``:67-77``).  PESQ is ITU C code and stays host-side (gated import, like the
reference); STOI here is an on-device short-time octave-band intelligibility
approximation (correlation of 1/3-octave envelopes over 384 ms windows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.stft import stft
from ..utils.config import StftConfig

_EPS = 1e-8


@jax.jit
def si_snr(ref: jnp.ndarray, est: jnp.ndarray) -> jnp.ndarray:
    """Scale-invariant SNR in dB over the last axis; batched elsewhere."""
    ref = ref - jnp.mean(ref, axis=-1, keepdims=True)
    est = est - jnp.mean(est, axis=-1, keepdims=True)
    dot = jnp.sum(ref * est, axis=-1, keepdims=True)
    energy = jnp.sum(ref * ref, axis=-1, keepdims=True)
    proj = dot / (energy + _EPS) * ref
    noise = est - proj
    return 10.0 * jnp.log10(
        (jnp.sum(proj**2, axis=-1) + _EPS) / (jnp.sum(noise**2, axis=-1) + _EPS)
    )


@jax.jit
def snr(ref: jnp.ndarray, est: jnp.ndarray) -> jnp.ndarray:
    """Classic SNR in dB of est vs ref."""
    err = ref - est
    return 10.0 * jnp.log10(
        (jnp.sum(ref**2, axis=-1) + _EPS) / (jnp.sum(err**2, axis=-1) + _EPS)
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def lsd(ref: jnp.ndarray, est: jnp.ndarray, cfg: StftConfig = StftConfig(2048, 512, 2048)) -> jnp.ndarray:
    """Log-spectral distance (dB): RMS over freq of 20*log10 magnitude ratio,
    mean over frames (matches ``evaluate_quality.py:45-52`` semantics)."""
    sr_ = jnp.abs(stft(ref, cfg)) + _EPS
    se_ = jnp.abs(stft(est, cfg)) + _EPS
    d = 20.0 * (jnp.log10(sr_) - jnp.log10(se_))
    return jnp.mean(jnp.sqrt(jnp.mean(d * d, axis=-1)), axis=-1)


def _third_octave_matrix(sr: int, n_fft: int, n_bands: int = 15, f_start: float = 150.0) -> np.ndarray:
    """(n_bins, n_bands) rectangular 1/3-octave band matrix (STOI-style)."""
    n_bins = n_fft // 2 + 1
    freqs = np.linspace(0, sr / 2, n_bins)
    mat = np.zeros((n_bins, n_bands), np.float32)
    for k in range(n_bands):
        lo = f_start * 2 ** (k / 3.0)
        hi = f_start * 2 ** ((k + 1) / 3.0)
        mat[:, k] = ((freqs >= lo) & (freqs < hi)).astype(np.float32)
    return mat


@functools.partial(jax.jit, static_argnames=("sample_rate",))
def stoi(ref: jnp.ndarray, est: jnp.ndarray, sample_rate: int = 16_000) -> jnp.ndarray:
    """Short-time objective intelligibility (approximation).

    1/3-octave band envelopes (25 ms frames), correlation over 384 ms
    (N=30 frame) segments with clipped normalization, averaged.  Tracks
    pystoi's ranking behavior; not bit-exact to the published algorithm.
    """
    n_fft = 512 if sample_rate <= 16_000 else 1024
    cfg = StftConfig(n_fft, n_fft // 2, n_fft)
    ob = jnp.asarray(_third_octave_matrix(sample_rate, n_fft))
    xr = jnp.sqrt((jnp.abs(stft(ref, cfg)) ** 2) @ ob + _EPS)  # (..., T', B)
    xe = jnp.sqrt((jnp.abs(stft(est, cfg)) ** 2) @ ob + _EPS)
    seg = 30
    t = xr.shape[-2]
    n_seg = max(t - seg + 1, 1)
    idx = jnp.arange(n_seg)[:, None] + jnp.arange(seg)[None, :]
    rs = xr[..., idx, :]  # (..., n_seg, seg, B)
    es = xe[..., idx, :]
    # normalize est segment energy to ref, clip at +15 dB SDR floor
    scale = jnp.sqrt(jnp.sum(rs**2, axis=-2, keepdims=True) / (jnp.sum(es**2, axis=-2, keepdims=True) + _EPS))
    es = es * scale
    beta = 10 ** (-15.0 / 20.0)
    es = jnp.minimum(es, rs * (1 + beta))
    rm = rs - jnp.mean(rs, axis=-2, keepdims=True)
    em = es - jnp.mean(es, axis=-2, keepdims=True)
    corr = jnp.sum(rm * em, axis=-2) / (
        jnp.linalg.norm(rm, axis=-2) * jnp.linalg.norm(em, axis=-2) + _EPS
    )
    return jnp.mean(corr, axis=(-2, -1))


def pesq_host(ref: np.ndarray, est: np.ndarray, sample_rate: int) -> float:
    """PESQ-wb, host-side (like the reference's gated import,
    ``evaluate_quality.py:11-18``).  Prefers the real ITU `pesq` package
    (resampling to 16 kHz wideband first — the package rejects other
    rates); when it is not installed, falls back to the calibrated Bark
    disturbance proxy (``eval/pesq_proxy.py``, accuracy note in
    docs/metrics.md).  ``pesq_impl()`` reports which one is active."""
    ref = np.asarray(ref, np.float64).reshape(-1)
    est = np.asarray(est, np.float64).reshape(-1)
    try:
        from pesq import pesq as _pesq  # type: ignore

        from .pesq_proxy import _to_16k

        try:
            return float(
                _pesq(16_000, _to_16k(ref, sample_rate), _to_16k(est, sample_rate), "wb")
            )
        except Exception:
            return float("nan")
    except ImportError:
        pass
    try:
        from .pesq_proxy import pesq_proxy

        return pesq_proxy(ref, est, sample_rate)
    except Exception:
        return float("nan")


def pesq_impl() -> str:
    """'itu' when the real `pesq` package is importable, else 'proxy'."""
    try:
        import pesq  # type: ignore  # noqa: F401

        return "itu"
    except ImportError:
        return "proxy"


@jax.jit
def si_sdr(ref: jnp.ndarray, est: jnp.ndarray) -> jnp.ndarray:
    """Alias used by the reference's LALM probe (``lalm_removal_test_gpt.py:61-68``)."""
    return si_snr(ref, est)
