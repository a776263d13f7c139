"""Framed STFT / iSTFT with Hann windows and exact COLA overlap-add.

Replaces the reference's ``torch.stft`` uses (spectral residual analysis at
``interpretability_research/scripts/analyze_perturbation.py:10-16``; LSD at
``audio_quality_check/evaluate_quality.py:45-52``) with a batched, jittable
front-end.  Framing is a static gather, synthesis is a scatter-add; both map
cleanly onto XLA and keep shapes static for the MXU downstream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import StftConfig

# ---------------------------------------------------------------------------
# DFT-as-matmul: XLA's FFT on TPU is weak at small transform sizes, while the
# same transform as an explicit (n_fft, n_fft//2+1) contraction rides the MXU
# (a 16-clip x 4 s batch at n_fft=1024 is ~13 GFLOP — sub-millisecond).
# Matrices are built/cached in numpy (never cache jnp arrays: they'd hold
# tracers if first built under jit) and converted at the call site.
# CPU keeps the real FFT (matmul DFT is O(N) slower there); override with
# NAWC_DFT=fft|matmul for A/B tests.
# ---------------------------------------------------------------------------
_MATMUL_DFT_MAX_NFFT = 4096


@functools.lru_cache(maxsize=8)
def _dft_mats_np(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    k = np.arange(n_fft // 2 + 1)
    n = np.arange(n_fft)
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft
    # float64 trig, cast after: keeps the basis orthogonal to f32 roundoff
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def _use_matmul_dft(n_fft: int) -> bool:
    import os

    forced = os.environ.get("NAWC_DFT", "")
    if forced == "fft":
        return False
    if forced == "matmul":
        return True
    return jax.default_backend() != "cpu" and n_fft <= _MATMUL_DFT_MAX_NFFT


def _rfft(frames: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """(..., n_fft) real -> (..., n_fft//2+1) complex."""
    if not _use_matmul_dft(n_fft):
        return jnp.fft.rfft(frames, n=n_fft, axis=-1)
    cos_m, sin_m = _dft_mats_np(n_fft)
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(frames, jnp.asarray(cos_m), precision=hi)
    im = jnp.dot(frames, jnp.asarray(sin_m), precision=hi)
    return jax.lax.complex(re, im)


def _irfft(spec: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """(..., n_fft//2+1) complex (Hermitian half) -> (..., n_fft) real."""
    if not _use_matmul_dft(n_fft):
        return jnp.fft.irfft(spec, n=n_fft, axis=-1)
    cos_m, sin_m = _dft_mats_np(n_fft)
    w = np.full(n_fft // 2 + 1, 2.0, np.float32)
    w[0] = 1.0
    w[-1] = 1.0
    hi = jax.lax.Precision.HIGHEST
    re = jnp.real(spec) * w
    im = jnp.imag(spec) * w
    x = jnp.dot(re, jnp.asarray(cos_m.T), precision=hi) + jnp.dot(
        im, jnp.asarray(sin_m.T), precision=hi
    )
    return x / float(n_fft)


def hann(win: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window (matches torch.hann_window default)."""
    n = np.arange(win)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win)
    return jnp.asarray(w, dtype=dtype)


def frame(x: jnp.ndarray, win: int, hop: int) -> jnp.ndarray:
    """(..., T) -> (..., n_frames, win) by strided gather (no copy semantics
    under XLA; lowers to a single gather)."""
    t = x.shape[-1]
    n_frames = 1 + (t - win) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(win)[None, :]
    return x[..., idx]


def overlap_add(frames: jnp.ndarray, hop: int, out_len: int) -> jnp.ndarray:
    """(..., n_frames, win) -> (..., out_len).

    When ``win % hop == 0`` (every framing in the package) the add is
    scatter-free: each frame is split into ``win//hop`` hop-sized chunks and
    the k overlapping contribution streams are shifted (static pads) and
    summed — scatters serialize on TPU, pads+adds fuse.  Other geometries
    fall back to a scatter-add."""
    n_frames, win = frames.shape[-2], frames.shape[-1]
    lead = frames.shape[:-2]
    pad_cfg = [(0, 0)] * len(lead)
    if win % hop == 0:
        k = win // hop
        fr = frames.reshape(lead + (n_frames, k, hop))
        full = (n_frames + k - 1) * hop  # == win + (n_frames - 1) * hop
        out = None
        for j in range(k):
            c = fr[..., :, j, :].reshape(lead + (n_frames * hop,))
            c = jnp.pad(c, pad_cfg + [(j * hop, full - (j + 1 + n_frames - 1) * hop)])
            out = c if out is None else out + c
        return out[..., :out_len] if out_len <= full else jnp.pad(
            out, pad_cfg + [(0, out_len - full)])
    idx = np.arange(n_frames)[:, None] * hop + np.arange(win)[None, :]
    flat_idx = jnp.asarray(idx.reshape(-1))
    fr = frames.reshape(lead + (n_frames * win,))
    out = jnp.zeros(lead + (out_len,), dtype=frames.dtype)
    return out.at[..., flat_idx].add(fr)


@functools.partial(jax.jit, static_argnames=("cfg", "center"))
def stft(x: jnp.ndarray, cfg: StftConfig = StftConfig(), center: bool = True) -> jnp.ndarray:
    """(..., T) real -> (..., n_frames, n_fft//2+1) complex64."""
    if center:
        pads = [(0, 0)] * (x.ndim - 1) + [(cfg.n_fft // 2, cfg.n_fft // 2)]
        x = jnp.pad(x, pads, mode="reflect")
    # pad so frames tile the whole signal (no dropped tail; istft is exact
    # for any length, unlike torch.stft's floor-frame behavior)
    t = x.shape[-1]
    tail = (t - cfg.win) % cfg.hop
    if tail:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, cfg.hop - tail)])
    frames = frame(x, cfg.win, cfg.hop) * hann(cfg.win, x.dtype)
    if cfg.win < cfg.n_fft:
        frames = jnp.pad(frames, [(0, 0)] * (frames.ndim - 1) + [(0, cfg.n_fft - cfg.win)])
    return _rfft(frames, cfg.n_fft)


@functools.partial(jax.jit, static_argnames=("cfg", "length", "center"))
def istft(
    spec: jnp.ndarray,
    cfg: StftConfig = StftConfig(),
    length: int | None = None,
    center: bool = True,
) -> jnp.ndarray:
    """Inverse of :func:`stft` with window-square COLA normalization."""
    frames = _irfft(spec, cfg.n_fft)[..., : cfg.win]
    w = hann(cfg.win, frames.dtype)
    frames = frames * w
    n_frames = spec.shape[-2]
    full_len = cfg.win + (n_frames - 1) * cfg.hop
    sig = overlap_add(frames, cfg.hop, full_len)
    # COLA normalization: sum of squared windows at each sample
    wsq = overlap_add(
        jnp.broadcast_to(w * w, (n_frames, cfg.win)), cfg.hop, full_len
    )
    sig = sig / jnp.maximum(wsq, 1e-8)
    if center:
        sig = sig[..., cfg.n_fft // 2 : full_len - cfg.n_fft // 2]
    if length is not None:
        sig = sig[..., :length]
        if sig.shape[-1] < length:
            pads = [(0, 0)] * (sig.ndim - 1) + [(0, length - sig.shape[-1])]
            sig = jnp.pad(sig, pads)
    return sig


def spectrogram(x: jnp.ndarray, cfg: StftConfig = StftConfig(), power: float = 1.0) -> jnp.ndarray:
    """Magnitude (power=1) or power (power=2) spectrogram."""
    s = jnp.abs(stft(x, cfg))
    return s if power == 1.0 else s**power


def num_frames(t: int, cfg: StftConfig, center: bool = True) -> int:
    """Static frame count for a length-t signal (matches :func:`stft`)."""
    if center:
        t = t + 2 * (cfg.n_fft // 2)
    return 1 + -(-(t - cfg.win) // cfg.hop)
