"""Saliency / attribution over detector inputs as batched vjp passes.

BASELINE.json's north star: "the interpretability layer (saliency/attribution
over spectrograms) becomes batched vjp passes instead of per-example Python
loops".  Provides input-gradient saliency, integrated gradients, and
spectrogram-domain aggregation of waveform attributions.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from ..dsp.stft import stft
from ..utils.config import StftConfig

ScoreFn = Callable[[jnp.ndarray], jnp.ndarray]  # (B, T) -> (B,)


def input_gradient(score_fn: ScoreFn, wav: jnp.ndarray) -> jnp.ndarray:
    """d score_i / d wav_i for every clip in one vjp (B, T)."""
    _, vjp = jax.vjp(score_fn, wav)
    (g,) = vjp(jnp.ones(wav.shape[0], wav.dtype))
    return g


def integrated_gradients(
    score_fn: ScoreFn,
    wav: jnp.ndarray,
    baseline: jnp.ndarray | None = None,
    steps: int = 16,
) -> jnp.ndarray:
    """IG along the straight path baseline->wav; the path dimension is a
    lax.map over batched vjps (all clips per step at once)."""
    base = jnp.zeros_like(wav) if baseline is None else baseline
    alphas = (jnp.arange(steps, dtype=wav.dtype) + 0.5) / steps

    def grad_at(a):
        return input_gradient(score_fn, base + a * (wav - base))

    grads = jax.lax.map(grad_at, alphas)  # (steps, B, T)
    return (wav - base) * jnp.mean(grads, axis=0)


@functools.partial(jax.jit, static_argnames=("cfg",))
def saliency_spectrogram(wav: jnp.ndarray, sal: jnp.ndarray, cfg: StftConfig = StftConfig()) -> jnp.ndarray:
    """Aggregate waveform attribution into TF energy: |STFT(wav*sal-weight)|
    heat — returns (B, T', F) saliency magnitude spectrogram."""
    return jnp.abs(stft(sal, cfg))


def topk_salient_frames(sal_spec: jnp.ndarray, k: int = 10) -> jnp.ndarray:
    """(B, T', F) -> (B, k) indices of the most attributed frames."""
    energy = jnp.sum(sal_spec**2, axis=-1)
    return jax.lax.top_k(energy, k)[1]
