import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent.parent))
import time, numpy as np, jax, jax.numpy as jnp
from nawc_tpu.codec import make_codec
from nawc_tpu.models import SpreadSpectrumWM
from nawc_tpu.utils.config import CodecConfig, SpreadSpectrumConfig
print("backend:", jax.default_backend(), flush=True)

cfg = CodecConfig(); sr = cfg.sample_rate
codec = make_codec(jax.random.PRNGKey(0), cfg)
wm = SpreadSpectrumWM(cfg=SpreadSpectrumConfig(sample_rate=sr, band_hi_hz=9000.0, alpha=0.1))
rng = np.random.default_rng(0)
wav = jnp.asarray(rng.normal(size=(16, sr*4)).astype(np.float32) * 0.1)
msg = jnp.asarray(rng.integers(0, 2, (16, wm.n_bits)), jnp.int32)

# XLA's own flop estimates
for name, fn, args in [("embed", jax.jit(wm.embed), (wav, msg)),
                       ("encode", jax.jit(codec.encode), (wav,)),
                       ("detect", jax.jit(wm.detect), (wav,))]:
    c = fn.lower(*args).compile().cost_analysis()
    fl = c.get("flops", float("nan")); by = c.get("bytes accessed", float("nan"))
    print(f"{name}: {fl/1e9:.2f} GFLOP, {by/1e6:.1f} MB accessed", flush=True)

# calibration: chained big matmul with known FLOPs
n = 4096
A = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32) / n**0.5)
@jax.jit
def mm_step(x):
    return (x @ A) * (1.0 + 1e-6)
x = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
x = mm_step(x); jax.block_until_ready(x)
iters = 30
t0 = time.perf_counter()
for _ in range(iters): x = mm_step(x)
jax.block_until_ready(x)
dt = (time.perf_counter() - t0) / iters
print(f"chained f32 matmul {n}x{n}: {dt*1e3:.3f} ms -> {2*n**3/dt/1e12:.1f} TFLOP/s", flush=True)
# bf16 version
Ab = A.astype(jnp.bfloat16)
@jax.jit
def mm_step_bf(x):
    return ((x @ Ab) * (1.0 + 1e-6)).astype(jnp.bfloat16)
xb = x.astype(jnp.bfloat16)
xb = mm_step_bf(xb); jax.block_until_ready(xb)
t0 = time.perf_counter()
for _ in range(iters): xb = mm_step_bf(xb)
jax.block_until_ready(xb)
dt = (time.perf_counter() - t0) / iters
print(f"chained bf16 matmul {n}x{n}: {dt*1e3:.3f} ms -> {2*n**3/dt/1e12:.1f} TFLOP/s", flush=True)
# dispatch floor: trivial op chained
@jax.jit
def triv(x): return x * 1.0000001
y = jnp.ones((8,128)); y = triv(y); jax.block_until_ready(y)
t0 = time.perf_counter()
for _ in range(100): y = triv(y)
jax.block_until_ready(y)
print(f"dispatch floor (chained trivial op): {(time.perf_counter()-t0)/100*1e3:.3f} ms", flush=True)
print("DONE")
