"""Watermarker API.

The de-facto framework API of the reference is
``Watermarker.embed(audio, sr) -> (wm_audio, payload)`` /
``.detect(audio, sr, payload) -> score`` (``watermark_testing.py:83-88``).
The TPU-native design differs deliberately:

  * batched: all methods take (B, T) waveforms, not single clips;
  * static sample rate: each watermarker declares its native rate and the
    caller resamples (keeps jit shapes static; the reference resampled
    inside every wrapper);
  * explicit PRNG: message/key threading instead of global torch seeds;
  * north-star shape (BASELINE.json): ``embed(wav, msg) -> wav_marked``,
    ``detect(wav) -> (presence_prob, bits)``.

``score`` reproduces each reference method's scalar detection-score semantic
so benchmark thresholds stay comparable (AudioSeal mean presence prob at
``watermark_testing.py:106-111``; WavMark 1 - BER at ``:130-138``; semantic
mean projection at ``:337-351``).
"""

from __future__ import annotations

from typing import Callable, Protocol, runtime_checkable

import jax
import jax.numpy as jnp


@runtime_checkable
class Watermarker(Protocol):
    """Batched watermark embedder/detector."""

    name: str
    sample_rate: int
    n_bits: int

    def embed(self, wav: jnp.ndarray, msg: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        """(B, T) @ sample_rate, (B, n_bits) in {0,1} -> (B, T) watermarked."""
        ...

    def detect(self, wav: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(B, T) -> (presence_prob (B,), bits (B, n_bits) in {0,1})."""
        ...

    def score(self, wav: jnp.ndarray, msg: jnp.ndarray | None = None) -> jnp.ndarray:
        """(B,) scalar detection score with the method's reference semantic."""
        ...


def random_message(key: jax.Array, batch: int, n_bits: int) -> jnp.ndarray:
    """Random payload bits (the reference draws a random 16-bit payload per
    embed, ``watermark_testing.py:124``)."""
    return jax.random.bernoulli(key, 0.5, (batch, n_bits)).astype(jnp.int32)


def bit_accuracy(bits: jnp.ndarray, msg: jnp.ndarray) -> jnp.ndarray:
    """(B, n_bits) x (B, n_bits) -> (B,) fraction of matching bits."""
    return jnp.mean((bits == msg).astype(jnp.float32), axis=-1)


# registry: name -> factory(key) -> Watermarker; populated by submodules
_REGISTRY: dict[str, Callable] = {}


def register(name: str):
    def deco(factory):
        _REGISTRY[name] = factory
        return factory
    return deco


def available() -> list[str]:
    return sorted(_REGISTRY)


def build(name: str, *args, **kwargs) -> "Watermarker":
    if name not in _REGISTRY:
        raise KeyError(f"unknown watermarker {name!r}; have {available()}")
    return _REGISTRY[name](*args, **kwargs)
