"""Convolutional building blocks for the SNAC-style codec.

Fresh Flax designs (NWC layout, 'SAME' padding so lengths divide exactly by
the stride products); the reference only ever consumes these shapes through
the pip ``snac`` package (SURVEY.md §2.2).  Snake activation keeps the codec
periodicity-biased, and everything is elementwise/conv so XLA fuses it around
the MXU convolutions.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

# `dtype` on every block is the COMPUTE dtype (flax casts inputs and params
# to it for the op; params are stored f32).  bfloat16 halves MXU cost and
# activation HBM traffic on TPU — the encode path's inference default.


class Snake(nn.Module):
    """Snake activation: x + sin^2(alpha x)/alpha with per-channel alpha."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        log_alpha = self.param("log_alpha", nn.initializers.zeros, (c,))
        alpha = jnp.exp(log_alpha).astype(self.dtype)
        x = x.astype(self.dtype)
        # bf16 shares f32's exponent range, so the tiny epsilon is exact
        return x + jnp.sin(alpha * x) ** 2 / (alpha + jnp.asarray(1e-9, self.dtype))


class ResidualUnit(nn.Module):
    dim: int
    dilation: int = 1
    kernel: int = 7
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = Snake(dtype=self.dtype)(x)
        y = nn.Conv(self.dim, (self.kernel,), kernel_dilation=(self.dilation,), padding="SAME", dtype=self.dtype)(y)
        y = Snake(dtype=self.dtype)(y)
        y = nn.Conv(self.dim, (1,), dtype=self.dtype)(y)
        return x + y


class EncoderBlock(nn.Module):
    out_dim: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        x = ResidualUnit(d, 1, dtype=self.dtype)(x)
        x = ResidualUnit(d, 3, dtype=self.dtype)(x)
        x = ResidualUnit(d, 9, dtype=self.dtype)(x)
        x = Snake(dtype=self.dtype)(x)
        x = nn.Conv(self.out_dim, (2 * self.stride,), strides=(self.stride,), padding="SAME", dtype=self.dtype)(x)
        return x


class NoiseBlock(nn.Module):
    """Adds per-step learned-amplitude noise (decoder texture), rng-gated."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, noise: jnp.ndarray | None = None) -> jnp.ndarray:
        c = x.shape[-1]
        gain = nn.Conv(c, (1,), use_bias=False, kernel_init=nn.initializers.zeros)(x)
        if noise is None:
            return x  # deterministic path (detection / tests)
        return x + gain * noise


class DecoderBlock(nn.Module):
    out_dim: int
    stride: int
    use_noise: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, noise: jnp.ndarray | None = None) -> jnp.ndarray:
        x = Snake(dtype=self.dtype)(x)
        x = nn.ConvTranspose(
            self.out_dim, (2 * self.stride,), strides=(self.stride,), padding="SAME",
            dtype=self.dtype,
        )(x)
        if self.use_noise:
            x = NoiseBlock()(x, noise)
        x = ResidualUnit(self.out_dim, 1, dtype=self.dtype)(x)
        x = ResidualUnit(self.out_dim, 3, dtype=self.dtype)(x)
        x = ResidualUnit(self.out_dim, 9, dtype=self.dtype)(x)
        return x
