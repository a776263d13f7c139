import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent.parent))
import time, numpy as np, jax, jax.numpy as jnp
from nawc_tpu.codec import make_codec
from nawc_tpu.utils.config import CodecConfig
cfg = CodecConfig()
codec = make_codec(jax.random.PRNGKey(0), cfg)
rng = np.random.default_rng(0)
enc = jax.jit(codec.encode)
x0 = jnp.asarray(rng.normal(size=(16, cfg.sample_rate*4)).astype(np.float32)*0.1)
out = enc(x0); jax.block_until_ready(out)  # compile

def chain(x, iters=5):
    for _ in range(iters):
        codes = enc(x)
        x = x * (1.0 + jnp.mean(codes[0].astype(jnp.float32)) * 1e-6)
    return x

# fresh chain, block only
xa = x0 * 1.0001; jax.block_until_ready(xa)
t0 = time.perf_counter(); xa = chain(xa); jax.block_until_ready(xa)
t_block = time.perf_counter() - t0
# now fetch the same buffer
t0 = time.perf_counter(); _ = np.asarray(xa)
t_fetch = time.perf_counter() - t0
print(f"chain of 5 encodes: block={t_block*1e3:.1f} ms, subsequent fetch={t_fetch*1e3:.1f} ms", flush=True)

# fresh chain, fetch-timed
xb = x0 * 1.0002; _ = np.asarray(xb)
t0 = time.perf_counter(); xb = chain(xb); _ = np.asarray(xb)
print(f"chain of 5 encodes: dispatch+fetch={(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)
print("DONE")
