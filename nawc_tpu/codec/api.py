"""Functional convenience API around :class:`SnacCodec`.

Bundles config + params into a small pytree-friendly state object and exposes
jitted pure functions, so pipelines (attacks, semantic watermarks, probes) can
close over a codec without touching Flax apply plumbing.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp

from ..utils.config import CodecConfig
from ..utils.padding import pad_to_multiple
from .model import SnacCodec


@dataclasses.dataclass(frozen=True)
class CodecState:
    """Immutable bundle of a codec definition and its parameters."""

    cfg: CodecConfig
    params: Any  # flax FrozenDict / dict pytree

    @property
    def model(self) -> SnacCodec:
        return SnacCodec(self.cfg)

    # ---- jit-safe functional methods -------------------------------------
    def encode_latent(self, wav: jnp.ndarray) -> jnp.ndarray:
        return _encode_latent(self.cfg, self.params, wav)

    def decode_latent(self, z: jnp.ndarray) -> jnp.ndarray:
        return _decode_latent(self.cfg, self.params, z)

    def encode(self, wav: jnp.ndarray) -> list[jnp.ndarray]:
        return _encode(self.cfg, self.params, wav)

    def decode(self, codes: Sequence[jnp.ndarray], level_mask: jnp.ndarray | None = None) -> jnp.ndarray:
        return _decode(self.cfg, self.params, tuple(codes), level_mask)

    def roundtrip(self, wav: jnp.ndarray) -> jnp.ndarray:
        return _roundtrip(self.cfg, self.params, wav)

    def forward(self, wav: jnp.ndarray) -> dict:
        return _forward(self.cfg, self.params, wav)

    def pad(self, wav: jnp.ndarray) -> jnp.ndarray:
        """Right-pad (..., T) to the codec chunk multiple (pad-to-4096 rule,
        ``watermark_testing.py:301-303``)."""
        return pad_to_multiple(wav, self.cfg.chunk, axis=-1)

    @property
    def projected_codebook(self) -> jnp.ndarray:
        """(K, codebook_dim) first-level codebook — the semantic watermarks'
        manifold source (``watermark_testing.py:237-265``)."""
        return self.params["params"]["quantizer"]["level_0"]["codebook"]

    def project_latent(self, z: jnp.ndarray) -> jnp.ndarray:
        """Apply the first VQ level's input projection (768 -> codebook_dim),
        the reference's ``get_projected_z`` (``watermark_testing.py:284-288``)."""
        p = self.params["params"]["quantizer"]["level_0"]["in_proj"]
        return z @ p["kernel"] + p["bias"]


def make_codec(key: jax.Array, cfg: CodecConfig = CodecConfig(), example_len: int | None = None) -> CodecState:
    """Initialize a codec with random weights."""
    t = example_len or cfg.chunk
    wav = jnp.zeros((1, t), jnp.float32)
    params = SnacCodec(cfg).init(key, wav)
    return CodecState(cfg=cfg, params=params)


def codec_apply(state: CodecState, method: str, *args, **kwargs):
    """Raw apply escape hatch: ``codec_apply(state, 'encode', wav)``."""
    return state.model.apply(state.params, *args, method=method, **kwargs)


# ---- jitted implementations (cfg static, params traced) -------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def _encode_latent(cfg: CodecConfig, params, wav):
    return SnacCodec(cfg).apply(params, wav, method="encode_latent")


@functools.partial(jax.jit, static_argnames=("cfg",))
def _decode_latent(cfg: CodecConfig, params, z):
    return SnacCodec(cfg).apply(params, z, method="decode_latent")


@functools.partial(jax.jit, static_argnames=("cfg",))
def _encode(cfg: CodecConfig, params, wav):
    from ..ops.rvq_fused import rvq_encode_fused

    z = SnacCodec(cfg).apply(params, wav, method="encode_latent")
    # fused multi-level RVQ kernel on TPU; identical unfused path elsewhere
    return rvq_encode_fused(z, params, cfg.vq_strides)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _decode(cfg: CodecConfig, params, codes, level_mask=None):
    return SnacCodec(cfg).apply(params, codes, level_mask, method="decode")


@functools.partial(jax.jit, static_argnames=("cfg",))
def _roundtrip(cfg: CodecConfig, params, wav):
    return SnacCodec(cfg).apply(params, wav, method="roundtrip")


@functools.partial(jax.jit, static_argnames=("cfg",))
def _forward(cfg: CodecConfig, params, wav):
    return SnacCodec(cfg).apply(params, wav)
