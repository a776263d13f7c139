import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent.parent))
import time, numpy as np, jax, jax.numpy as jnp
from nawc_tpu.codec import make_codec
from nawc_tpu.utils.config import CodecConfig
cfg = CodecConfig()
codec = make_codec(jax.random.PRNGKey(0), cfg)
rng = np.random.default_rng(0)
enc = jax.jit(codec.encode)
# warm compile
x = jnp.asarray(rng.normal(size=(16, cfg.sample_rate*4)).astype(np.float32)*0.1)
out = enc(x); jax.block_until_ready(out)
# fresh input every call, synchronous
for it in range(6):
    xn = rng.normal(size=(16, cfg.sample_rate*4)).astype(np.float32)*0.1
    t0 = time.perf_counter()
    xd = jnp.asarray(xn)
    t1 = time.perf_counter()
    out = enc(xd)
    jax.block_until_ready(out)
    t2 = time.perf_counter()
    print(f"iter {it}: h2d {1e3*(t1-t0):.2f} ms, encode+sync {1e3*(t2-t1):.2f} ms", flush=True)
# and: same input repeated, synchronous each time
xd = jnp.asarray(rng.normal(size=(16, cfg.sample_rate*4)).astype(np.float32)*0.1)
out = enc(xd); jax.block_until_ready(out)
for it in range(4):
    t0 = time.perf_counter(); out = enc(xd); jax.block_until_ready(out)
    print(f"repeat {it}: encode+sync {1e3*(time.perf_counter()-t0):.2f} ms", flush=True)
print("DONE")
