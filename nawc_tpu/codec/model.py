"""SNAC-style neural audio codec: conv encoder -> multi-scale residual VQ ->
conv decoder, fully jittable, static shapes, NWC layout.

Capability parity targets (what the reference uses the pip ``snac`` model
for, SURVEY.md §2.2):
  * ``encode(wav) -> [codes_level0, codes_level1, ...]`` per-level token
    tensors at strides ``vq_strides`` (``run_snac_layer_ablation.py:115-123``)
  * ``decode(codes) -> wav`` (the LALM/codec-roundtrip attack,
    ``watermark_testing.py:42-79``)
  * direct encoder/quantizer access for the semantic watermarks: latent
    (B, T', 768), 768->8 input projection, (4096, 8) codebook
    (``watermark_testing.py:237-265``, ``design_pca_watermark.py:53-59``)
  * continuous-latent encode + quantizer-bypass decode for the latent-space
    PGD/PCA experiments (``pgd_research/src/misc/attack_baselines.py:44-66``)
  * masked decode for codebook-layer ablation
    (``run_snac_layer_ablation.py:92-134``)
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.rvq import nearest_codebook
from ..utils.config import CodecConfig
from .layers import DecoderBlock, EncoderBlock, ResidualUnit, Snake


class Encoder(nn.Module):
    cfg: CodecConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, T) waveform -> (B, T/hop, latent_dim) latents (f32 out;
        compute in cfg.compute_dtype, bfloat16 by default on the inference
        path — halves MXU cost + activation HBM traffic)."""
        cfg = self.cfg
        dt = cfg.compute_jnp_dtype
        h = x[..., None].astype(dt)  # NWC
        h = nn.Conv(cfg.encoder_dim, (7,), padding="SAME", dtype=dt)(h)
        dim = cfg.encoder_dim
        for rate in cfg.encoder_rates:
            dim *= 2
            h = EncoderBlock(dim, rate, dtype=dt)(h)
        h = Snake(dtype=dt)(h)
        h = nn.Conv(cfg.latent_dim, (3,), padding="SAME", dtype=dt)(h)
        return h.astype(jnp.float32)


class Decoder(nn.Module):
    cfg: CodecConfig

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        """(B, T/hop, latent_dim) -> (B, T) waveform in [-1, 1]."""
        cfg = self.cfg
        dt = cfg.compute_jnp_dtype
        h = nn.Conv(cfg.decoder_dim, (7,), padding="SAME", dtype=dt)(z.astype(dt))
        dim = cfg.decoder_dim
        for rate in cfg.decoder_rates:
            dim //= 2
            h = DecoderBlock(dim, rate, use_noise=False, dtype=dt)(h)
        h = Snake(dtype=dt)(h)
        # zero-init the output projection: the deep snake/conv stack has
        # large activations at init, and a default-init final conv rails the
        # tanh at +-1 (dead gradients); starting at tanh(0)=0 keeps the
        # output in the linear region
        h = nn.Conv(1, (7,), padding="SAME", kernel_init=nn.initializers.zeros)(h)
        return jnp.tanh(h)[..., 0]


class VQLevel(nn.Module):
    """One residual-VQ level operating at temporal stride `stride`."""

    cfg: CodecConfig
    stride: int

    def setup(self):
        cfg = self.cfg
        self.in_proj = nn.Dense(cfg.codebook_dim, name="in_proj")
        self.out_proj = nn.Dense(cfg.latent_dim, name="out_proj")
        self.codebook = self.param(
            "codebook",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (cfg.codebook_size, cfg.codebook_dim),
        )

    def encode(self, residual: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """residual (B, T', D) -> (codes (B, T'/s), z_e (B, T'/s, cb_dim))."""
        z = residual
        if self.stride > 1:
            b, t, d = z.shape
            z = z.reshape(b, t // self.stride, self.stride, d).mean(axis=2)
        z_e = self.in_proj(z)
        codes = nearest_codebook(z_e, self.codebook)
        return codes, z_e

    def dequantize(self, codes: jnp.ndarray, out_len: int) -> jnp.ndarray:
        """codes (B, T'/s) -> (B, out_len, latent_dim) contribution."""
        z_q = jnp.take(self.codebook, codes, axis=0)
        out = self.out_proj(z_q)
        if self.stride > 1:
            out = jnp.repeat(out, self.stride, axis=1)
        return out[:, :out_len]

    def __call__(self, residual: jnp.ndarray):
        """Straight-through quantization of one level.

        Returns (quantized contribution at full latent rate, codes,
        commitment loss, codebook loss).
        """
        codes, z_e = self.encode(residual)
        z_q = jnp.take(self.codebook, codes, axis=0)
        commit = jnp.mean((z_e - jax.lax.stop_gradient(z_q)) ** 2)
        codebook_loss = jnp.mean((z_q - jax.lax.stop_gradient(z_e)) ** 2)
        z_q = z_e + jax.lax.stop_gradient(z_q - z_e)  # STE
        out = self.out_proj(z_q)
        if self.stride > 1:
            out = jnp.repeat(out, self.stride, axis=1)
        return out[:, : residual.shape[1]], codes, commit, codebook_loss


class ResidualVQ(nn.Module):
    cfg: CodecConfig

    def setup(self):
        self.levels = [
            VQLevel(self.cfg, stride=s, name=f"level_{i}")
            for i, s in enumerate(self.cfg.vq_strides)
        ]

    def __call__(self, z: jnp.ndarray):
        """z (B, T', D) -> (z_q, codes list, commit loss, codebook loss)."""
        residual = z
        z_q = jnp.zeros_like(z)
        codes = []
        commit = 0.0
        cb_loss = 0.0
        for level in self.levels:
            out, c, cm, cb = level(residual)
            residual = residual - jax.lax.stop_gradient(out)
            z_q = z_q + out
            codes.append(c)
            commit = commit + cm
            cb_loss = cb_loss + cb
        return z_q, codes, commit, cb_loss

    def encode(self, z: jnp.ndarray) -> list[jnp.ndarray]:
        residual = z
        codes = []
        for level in self.levels:
            c, _ = level.encode(residual)
            out = level.dequantize(c, residual.shape[1])
            residual = residual - out
            codes.append(c)
        return codes

    def from_codes(
        self, codes: Sequence[jnp.ndarray], out_len: int, level_mask: jnp.ndarray | None = None
    ) -> jnp.ndarray:
        """codes -> z_q; `level_mask` (num_levels,) zeroes levels (ablation)."""
        z_q = None
        for i, level in enumerate(self.levels):
            out = level.dequantize(codes[i], out_len)
            if level_mask is not None:
                out = out * level_mask[i]
            z_q = out if z_q is None else z_q + out
        return z_q


class SnacCodec(nn.Module):
    """Full codec.  All public methods are jit-safe given static shapes."""

    cfg: CodecConfig = CodecConfig()

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.quantizer = ResidualVQ(self.cfg)
        self.decoder = Decoder(self.cfg)

    def __call__(self, wav: jnp.ndarray):
        """Training forward: (B, T) -> dict with recon + VQ losses."""
        z = self.encoder(wav)
        z_q, codes, commit, cb_loss = self.quantizer(z)
        recon = self.decoder(z_q)
        return {
            "recon": recon,
            "codes": codes,
            "latent": z,
            "commit_loss": commit,
            "codebook_loss": cb_loss,
        }

    def encode_latent(self, wav: jnp.ndarray) -> jnp.ndarray:
        """Continuous encoder latents (B, T/hop, latent_dim) — the semantic
        watermarks' host space and the EnCodec-style probe."""
        return self.encoder(wav)

    def decode_latent(self, z: jnp.ndarray) -> jnp.ndarray:
        """Quantizer-bypass decode (latent-space attack experiments)."""
        return self.decoder(z)

    def encode(self, wav: jnp.ndarray) -> list[jnp.ndarray]:
        """(B, T) -> list of per-level code tensors (B, T/hop/stride_i)."""
        return self.quantizer.encode(self.encoder(wav))

    def decode(self, codes: Sequence[jnp.ndarray], level_mask: jnp.ndarray | None = None) -> jnp.ndarray:
        """codes -> (B, T) waveform; optional level ablation mask."""
        out_len = codes[-1].shape[1] * self.cfg.vq_strides[-1]
        z_q = self.quantizer.from_codes(codes, out_len, level_mask)
        return self.decoder(z_q)

    def roundtrip(self, wav: jnp.ndarray) -> jnp.ndarray:
        """encode -> quantize -> decode (the LALM attack inner op)."""
        z = self.encoder(wav)
        z_q, _, _, _ = self.quantizer(z)
        return self.decoder(z_q)
