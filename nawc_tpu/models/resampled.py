"""Rate-adapting watermarker wrapper.

Every watermarker in the package declares a *native* sample rate and keeps
its jit shapes static (models/base.py design note).  The reference instead
resamples inside every wrapper call (``watermark_testing.py:89-104``), which
lets its interpretability pipelines mix methods with different rates in one
sweep (``run_manifold_analysis_all.py:325-515`` runs all six watermarks over
the same 24 kHz SNAC clips).  ``ResampledWM`` recovers that capability
without giving up static shapes: it presents a watermarker at an *outer*
rate by polyphase-resampling on the way in/out of the wrapped method.  The
resampling is jittable, differentiable, and batched, so wrapped methods stay
usable inside jit'd eval pipelines.

Semantics:
  * ``embed``: outer-rate audio -> inner rate -> inner embed -> back to the
    outer rate, trimmed/padded to the input length (codec ``decode(encode)``
    length contract).
  * ``detect``/``score``: outer-rate audio is downsampled to the inner rate
    before detection.  The watermark residual survives the extra resample
    pass because every method embeds below 0.45x its native Nyquist.
  * ``projections`` is deliberately NOT forwarded: codec-latent methods are
    already at the codec rate and never need wrapping.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..dsp.resample import resample


def _match_len(x: jnp.ndarray, t: int) -> jnp.ndarray:
    if x.shape[-1] == t:
        return x
    if x.shape[-1] > t:
        return x[..., :t]
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, t - x.shape[-1])])


@dataclasses.dataclass(frozen=True)
class ResampledWM:
    """Present ``inner`` (native ``inner.sample_rate``) at ``sample_rate``."""

    inner: object
    sample_rate: int

    @property
    def name(self) -> str:
        return self.inner.name

    @property
    def n_bits(self) -> int:
        return getattr(self.inner, "n_bits", 0)

    def _down(self, wav: jnp.ndarray) -> jnp.ndarray:
        return resample(wav, self.sample_rate, self.inner.sample_rate)

    def embed(self, wav: jnp.ndarray, msg=None, key=None) -> jnp.ndarray:
        down = self._down(wav)
        if self.n_bits > 0:
            if msg is None:
                raise ValueError(f"{self.name} carries bits; msg is required")
            marked = self.inner.embed(down, msg, key) if key is not None else self.inner.embed(down, msg)
        else:
            marked = self.inner.embed(down)
        up = resample(marked, self.inner.sample_rate, self.sample_rate)
        return _match_len(up, wav.shape[-1])

    def detect(self, wav: jnp.ndarray):
        return self.inner.detect(self._down(wav))

    def score(self, wav: jnp.ndarray, msg=None) -> jnp.ndarray:
        if msg is None:
            return self.inner.score(self._down(wav))
        return self.inner.score(self._down(wav), msg)


def at_rate(wm, sample_rate: int):
    """``wm`` if already native at ``sample_rate``, else wrapped."""
    return wm if wm.sample_rate == sample_rate else ResampledWM(wm, sample_rate)
