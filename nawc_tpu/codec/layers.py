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


class Snake(nn.Module):
    """Snake activation: x + sin^2(alpha x)/alpha with per-channel alpha."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        log_alpha = self.param("log_alpha", nn.initializers.zeros, (c,))
        alpha = jnp.exp(log_alpha)
        return x + jnp.sin(alpha * x) ** 2 / (alpha + 1e-9)


class ResidualUnit(nn.Module):
    dim: int
    dilation: int = 1
    kernel: int = 7

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = Snake()(x)
        y = nn.Conv(self.dim, (self.kernel,), kernel_dilation=(self.dilation,), padding="SAME")(y)
        y = Snake()(y)
        y = nn.Conv(self.dim, (1,))(y)
        return x + y


class EncoderBlock(nn.Module):
    out_dim: int
    stride: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        x = ResidualUnit(d, 1)(x)
        x = ResidualUnit(d, 3)(x)
        x = ResidualUnit(d, 9)(x)
        x = Snake()(x)
        x = nn.Conv(self.out_dim, (2 * self.stride,), strides=(self.stride,), padding="SAME")(x)
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

    @nn.compact
    def __call__(self, x: jnp.ndarray, noise: jnp.ndarray | None = None) -> jnp.ndarray:
        x = Snake()(x)
        x = nn.ConvTranspose(
            self.out_dim, (2 * self.stride,), strides=(self.stride,), padding="SAME"
        )(x)
        if self.use_noise:
            x = NoiseBlock()(x, noise)
        x = ResidualUnit(self.out_dim, 1)(x)
        x = ResidualUnit(self.out_dim, 3)(x)
        x = ResidualUnit(self.out_dim, 9)(x)
        return x
