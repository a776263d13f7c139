"""Per-stage timing of the codec encode path on the real chip (chained +
d2h methodology from bench.py).  Which encoder block owns the 78 ms?

Usage: python scripts/scratch/profile_encode.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import chained_time, wait_for_device
from nawc_tpu.codec import make_codec
from nawc_tpu.utils.config import CodecConfig

wait_for_device()

cfg = CodecConfig(compute_dtype="bfloat16")
codec = make_codec(jax.random.PRNGKey(0), cfg)
sr = cfg.sample_rate
batch, seconds = 16, 4
rng = np.random.default_rng(0)
wav = jnp.asarray(rng.normal(size=(batch, sr * seconds)).astype(np.float32) * 0.1)

from nawc_tpu.codec.layers import EncoderBlock, Snake
from nawc_tpu.codec.model import Encoder, SnacCodec

params = codec.params

# 1. whole encode (encoder + RVQ) as the baseline
def encode_step(x):
    codes = codec.encode(x)
    return x * (1.0 + jnp.mean(codes[0].astype(jnp.float32)) * 1e-6)

# 2. encoder only (no RVQ)
model = SnacCodec(cfg)

def encoder_step(x):
    z = model.apply(params, x, method="encode_latent")
    return x * (1.0 + jnp.mean(z) * 1e-6)

# 3. encoder prefixes: rebuild sub-stacks with the same params by monkey
#    depth — instead, time per-block shapes with fresh params (same shapes
#    and dtypes = same cost model)
import flax.linen as nn

dt = cfg.compute_jnp_dtype
t = sr * seconds
results = {}
results["encode(full)"] = chained_time(encode_step, wav) * 1e3
results["encoder_only"] = chained_time(encoder_step, wav) * 1e3

# per-block cost with representative shapes
block_shapes = []
dim = cfg.encoder_dim
tl = t
for i, rate in enumerate(cfg.encoder_rates):
    block_shapes.append((f"block{i}(in{dim}->out{dim*2},s{rate},T{tl})", dim, dim * 2, rate, tl))
    dim *= 2
    tl //= rate

for name, din, dout, rate, tl in block_shapes:
    blk = EncoderBlock(dout, rate, dtype=dt)
    x0 = jnp.asarray(rng.normal(size=(batch, tl, din)).astype(np.float32))
    p = blk.init(jax.random.PRNGKey(1), x0)

    def blk_step(x, blk=blk, p=p):
        y = blk.apply(p, x)
        return x * (1.0 + jnp.mean(y.astype(jnp.float32)) * 1e-6)

    results[name] = chained_time(blk_step, x0) * 1e3

# RVQ alone: quantizer.encode on the latent
z0 = model.apply(params, wav, method="encode_latent")

def rvq_step(z):
    codes = model.apply(params, z, method=lambda m, zz: m.quantizer.encode(zz))
    return z * (1.0 + jnp.mean(codes[0].astype(jnp.float32)) * 1e-6)

results["rvq_only"] = chained_time(rvq_step, z0) * 1e3

# batch scaling: does encode time scale sublinearly (dispatch/utilization
# headroom at batch 16)?
for b in (32, 64):
    wav_b = jnp.asarray(rng.normal(size=(b, sr * seconds)).astype(np.float32) * 0.1)
    results[f"encode(full)@b{b}"] = chained_time(encode_step, wav_b, iters=4) * 1e3

for k, v in results.items():
    print(f"{k:42s} {v:8.2f} ms", flush=True)
