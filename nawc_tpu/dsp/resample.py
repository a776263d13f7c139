"""Polyphase windowed-sinc resampler as a single strided convolution.

Replaces the reference's ``torchaudio.functional.resample`` hops (24 kHz <->
16/44.1 kHz conversions inside every wrapper, e.g. ``watermark_testing.py:49-79``)
with a batched jnp implementation: the polyphase filterbank is built host-side
per (orig, new) pair, and resampling is ONE ``lax.conv_general_dilated`` with
stride = orig/gcd — i.e. an MXU matmul, not a Python loop.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _polyphase_kernel(
    orig: int, new: int, lowpass_filter_width: int = 6, rolloff: float = 0.99
) -> tuple[np.ndarray, int, int, int]:
    """Build (new', 1, 2*width + orig') bank of windowed-sinc filters.

    Derivation: y[q*n + i] = sum_m x[q*o + m] * h(i*o/n - m) with h a
    Hann^2-windowed sinc low-passed at min(o, n)*rolloff.  Phase i becomes
    output channel i of a stride-o convolution.
    """
    g = math.gcd(orig, new)
    o, n = orig // g, new // g
    base_freq = min(o, n) * rolloff
    width = int(math.ceil(lowpass_filter_width * o / base_freq))
    karr = np.arange(-width, width + o, dtype=np.float64)[None, :] / o  # seconds*o
    phase = -np.arange(n, dtype=np.float64)[:, None] / n
    t = (phase + karr) * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2.0) ** 2
    tpi = t * np.pi
    kern = np.where(tpi == 0.0, 1.0, np.sin(tpi) / np.where(tpi == 0.0, 1.0, tpi))
    kern = kern * window * (base_freq / o)
    return kern[:, None, :].astype(np.float32), o, n, width


@functools.partial(jax.jit, static_argnames=("orig", "new", "lowpass_filter_width", "rolloff"))
def resample(
    x: jnp.ndarray,
    orig: int,
    new: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> jnp.ndarray:
    """Resample (..., T) from `orig` Hz to `new` Hz. Output length ceil(T*new/orig)."""
    if orig == new:
        return x
    kern_np, o, n, width = _polyphase_kernel(orig, new, lowpass_filter_width, rolloff)
    kern = jnp.asarray(kern_np)
    lead = x.shape[:-1]
    t_in = x.shape[-1]
    xb = x.reshape((-1, 1, t_in))
    xb = jnp.pad(xb, ((0, 0), (0, 0), (width, width + o)))
    y = jax.lax.conv_general_dilated(
        xb, kern, window_strides=(o,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # (B, n, Q)
    y = jnp.swapaxes(y, 1, 2).reshape((xb.shape[0], -1))  # interleave phases
    target = int(-(-t_in * n) // o) if False else int(math.ceil(t_in * n / o))
    y = y[:, :target]
    return y.reshape(lead + (target,))


def resample_length(t_in: int, orig: int, new: int) -> int:
    """Static output length of :func:`resample`."""
    g = math.gcd(orig, new)
    return int(math.ceil(t_in * (new // g) / (orig // g)))
