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


def _sin2_periodic(z: jnp.ndarray) -> jnp.ndarray:
    """sin(z)^2 via range reduction + Taylor-7, ~12 cheap VPU ops.

    XLA's `sin` lowering dominates the encoder on TPU (measured: one
    jnp.sin snake over (16, 96000, 48) costs 5.2 ms — the 7 snakes in the
    first encoder block cost more than all its convolutions combined).
    sin^2 has period pi and is even, so reduce u = z/pi - round(z/pi) to
    [-0.5, 0.5] and evaluate sin(pi*u) by Taylor-7: max abs error 1.6e-4
    at |u| = 0.5 — an order below bf16 resolution (~4e-3 at 1.0), so the
    trained checkpoint's behavior is unchanged on the inference path."""
    # range reduction in f32: bf16's 8 mantissa bits would put ~6e-2 error
    # on u for |z| > pi, which the polynomial would faithfully amplify
    zf = z.astype(jnp.float32)
    u = zf * jnp.float32(1.0 / jnp.pi)
    u = u - jnp.round(u)
    p = u * jnp.float32(jnp.pi)
    p2 = p * p
    # sin(p) = p*(1 - p2/6*(1 - p2/20*(1 - p2/42)))
    s = p * (1.0 - p2 / 6.0 * (1.0 - p2 / 20.0 * (1.0 - p2 / 42.0)))
    return (s * s).astype(z.dtype)


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
        return x + _sin2_periodic(alpha * x) / (alpha + jnp.asarray(1e-9, self.dtype))


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
