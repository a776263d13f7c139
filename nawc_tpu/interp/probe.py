"""Latent probing: the reference's ``SNACProbe`` (get per-clip codec-encoder
latents, ``run_nonsemantic_manifold_analysis.py:84-120``) as batched jitted
functions over a CodecState."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..codec.api import CodecState
from ..codec.model import SnacCodec
from ..utils.config import CodecConfig
from ..utils.padding import pad_to_multiple


@functools.partial(jax.jit, static_argnames=("codec_cfg",))
def _latent(codec_cfg: CodecConfig, params, wav: jnp.ndarray) -> jnp.ndarray:
    x = pad_to_multiple(wav, codec_cfg.chunk, axis=-1)
    return SnacCodec(codec_cfg).apply(params, x, method="encode_latent")


def get_latent(codec: CodecState, wav: jnp.ndarray) -> jnp.ndarray:
    """(B, T) -> (B, T', D) encoder latents (probe space)."""
    return _latent(codec.cfg, codec.params, wav)


def get_mean_latent(codec: CodecState, wav: jnp.ndarray) -> jnp.ndarray:
    """(B, T) -> (B, D) time-averaged latents (the reference's per-file
    ``mean_z``, ``run_manifold_analysis_all.py:152-161``)."""
    return jnp.mean(get_latent(codec, wav), axis=-2)


def project_on_axis(codec: CodecState, wav: jnp.ndarray, axis: jnp.ndarray) -> jnp.ndarray:
    """(B, T) x (D,) -> (B, T') per-frame projections in latent space."""
    return get_latent(codec, wav) @ axis
