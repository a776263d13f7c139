"""Attack registry: the raw_bench 20-attack suite + codec attacks + PGD.

`build_suite(sr, codec)` returns {name: fn(wav, key) -> wav} covering every
attack family the reference's robustness tables enumerate
(``audioseal_stats_loose/stats_by_attack.csv:2-21``).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from . import dsp
from .codec import (
    ablation_masks,
    codec_roundtrip,
    latent_roundtrip,
    latent_transform_attack,
    layer_ablation,
)
from .pgd import pgd_attack, project_to_nullspace, subspace_pgd_attack

AttackFn = Callable[[jnp.ndarray, jax.Array], jnp.ndarray]


def build_suite(sr: int = 16_000, codec=None) -> dict[str, AttackFn]:
    """Named attack suite at sample rate `sr`.  `codec` (CodecState) enables
    the neural-codec round-trip entries (encodec/dac)."""
    suite: dict[str, AttackFn] = {
        "identity": lambda w, k: w,
        "gain": lambda w, k: dsp.gain(w, 2.0),
        "polarity": lambda w, k: dsp.polarity(w),
        "gaussian_noise": lambda w, k: dsp.gaussian_noise(w, k, snr_db=40.0),
        "background_noise": lambda w, k: dsp.background_noise(w, k, snr_db=25.0),
        "lowpass": lambda w, k: dsp.lowpass(w, 3500.0, sr),
        "highpass": lambda w, k: dsp.highpass(w, 500.0, sr),
        "eq": lambda w, k: dsp.eq(w, k, sr),
        "quantization": lambda w, k: dsp.quantization(w, 8),
        "dynamic_range_compression": lambda w, k: dsp.dynamic_range_compression(w),
        "dynamic_range_expansion": lambda w, k: dsp.dynamic_range_expansion(w),
        "limiter": lambda w, k: dsp.limiter(w),
        "phase_shift": lambda w, k: dsp.phase_shift(w),
        "time_jitter": lambda w, k: dsp.time_jitter(w, k, 2.0, sr),
        "time_stretch": lambda w, k: dsp.time_stretch(w, 950),
        "reverb": lambda w, k: dsp.reverb(w, k, 300.0, sr),
        "mp3": lambda w, k: dsp.mp3(w, sr),
        "aac": lambda w, k: dsp.aac(w, sr),
        "vorbis": lambda w, k: dsp.vorbis(w, sr),
    }
    if codec is not None:
        suite["encodec"] = lambda w, k: codec_roundtrip(codec, w, in_sr=sr)
        suite["dac"] = lambda w, k: codec_roundtrip(codec, w, in_sr=sr)
    return suite


__all__ = [
    "build_suite",
    "dsp",
    "codec_roundtrip",
    "layer_ablation",
    "ablation_masks",
    "latent_roundtrip",
    "latent_transform_attack",
    "pgd_attack",
    "subspace_pgd_attack",
    "project_to_nullspace",
]
