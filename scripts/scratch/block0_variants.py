"""Where do block0's 45.6 ms go?  Time isolated variants on the chip:
  a) EncoderBlock as-is (baseline)
  b) snake -> relu            (isolate activation cost)
  c) conv7 via unrolled-taps einsum (forces plain matmuls, N=48)
  d) single conv7 alone       (one op, no residual chain)
  e) single snake alone
"""

import sys

sys.path.insert(0, "/root/repo")

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from bench import chained_time, wait_for_device
from nawc_tpu.codec.layers import EncoderBlock, ResidualUnit, Snake

wait_for_device()

dt = jnp.bfloat16
B, T, C = 16, 96_000, 48
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))


def timeit(name, mod, x):
    p = mod.init(jax.random.PRNGKey(1), x)

    def step(v):
        y = mod.apply(p, v)
        s = jnp.mean(y.astype(jnp.float32)) * 1e-6
        return v * (1.0 + s)

    ms = chained_time(step, x, iters=8) * 1e3
    print(f"{name:36s} {ms:8.2f} ms", flush=True)


class ReluUnit(nn.Module):
    dim: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(self.dim, (7,), kernel_dilation=(self.dilation,), padding="SAME", dtype=dt)(y)
        y = nn.relu(y)
        y = nn.Conv(self.dim, (1,), dtype=dt)(y)
        return x + y


class ReluBlock(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = ReluUnit(C, 1)(x)
        x = ReluUnit(C, 3)(x)
        x = ReluUnit(C, 9)(x)
        x = nn.relu(x)
        return nn.Conv(2 * C, (4,), strides=(2,), padding="SAME", dtype=dt)(x)


class TapConv(nn.Module):
    """7-tap dilated conv as 7 shifted-slice matmuls (one einsum)."""

    dim: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        k = 7
        w = self.param("w", nn.initializers.lecun_normal(), (k, x.shape[-1], self.dim))
        b = self.param("b", nn.initializers.zeros, (self.dim,))
        d = self.dilation
        pad = (k // 2) * d
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0))).astype(dt)
        t = x.shape[1]
        y = sum(
            jnp.einsum("btc,co->bto", jax.lax.dynamic_slice_in_dim(xp, i * d, t, 1),
                       w[i].astype(dt))
            for i in range(k)
        )
        return y + b.astype(dt)


class TapUnit(nn.Module):
    dim: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        y = Snake(dtype=dt)(x)
        y = TapConv(self.dim, self.dilation)(y)
        y = Snake(dtype=dt)(y)
        y = nn.Conv(self.dim, (1,), dtype=dt)(y)
        return x + y


class TapBlock(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = TapUnit(C, 1)(x)
        x = TapUnit(C, 3)(x)
        x = TapUnit(C, 9)(x)
        x = Snake(dtype=dt)(x)
        return nn.Conv(2 * C, (4,), strides=(2,), padding="SAME", dtype=dt)(x)


class OneConv(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Conv(C, (7,), kernel_dilation=(9,), padding="SAME", dtype=dt)(x)


class OneSnake(nn.Module):
    @nn.compact
    def __call__(self, x):
        return Snake(dtype=dt)(x)


timeit("a) EncoderBlock (baseline)", EncoderBlock(2 * C, 2, dtype=dt), x0)
timeit("b) relu variant", ReluBlock(), x0)
timeit("c) taps-einsum variant", TapBlock(), x0)
timeit("d) one conv7 d9", OneConv(), x0)
timeit("e) one snake", OneSnake(), x0)
