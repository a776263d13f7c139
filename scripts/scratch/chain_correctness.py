import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent.parent))
import time, numpy as np, jax, jax.numpy as jnp
from nawc_tpu.codec import make_codec
from nawc_tpu.utils.config import CodecConfig
cfg = CodecConfig()
codec = make_codec(jax.random.PRNGKey(0), cfg)
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.normal(size=(4, cfg.sample_rate)).astype(np.float32)*0.1)  # small: 1s, batch 4

def step(x):
    codes = codec.encode(x)
    return x * (1.0 + jnp.mean(codes[0].astype(jnp.float32)) * 1e-6), codes

# warm
x, c = step(x0); jax.block_until_ready(x)

# chained loop, bench-style
xs = x0 * 1.001; jax.block_until_ready(xs)
t0 = time.perf_counter()
last_codes = None
for i in range(6):
    xs, last_codes = step(xs)
jax.block_until_ready(xs)
t_chain = time.perf_counter() - t0
# fetch final state + codes
xs_np = np.asarray(xs); codes_np = [np.asarray(c) for c in last_codes]
t_fetch = time.perf_counter() - t0 - t_chain
print(f"chain of 6: block={t_chain*1e3:.1f} ms (+fetch {t_fetch*1e3:.1f} ms)", flush=True)

# ground truth on CPU
import jax.numpy as jnp2
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    params_cpu = jax.device_put(codec.params, cpu)
    x_cpu = jax.device_put(x0, cpu) * 1.001
    import dataclasses
    codec_cpu = dataclasses.replace(codec, params=params_cpu)
    for i in range(6):
        codes_cpu = codec_cpu.encode(x_cpu)
        x_cpu = x_cpu * (1.0 + jnp2.mean(codes_cpu[0].astype(jnp2.float32)) * 1e-6)
    x_cpu_np = np.asarray(x_cpu); codes_cpu_np = [np.asarray(c) for c in codes_cpu]

err = np.abs(xs_np - x_cpu_np).max()
code_mismatch = [int((a != b).sum()) for a, b in zip(codes_np, codes_cpu_np)]
print(f"final-state maxerr vs CPU truth: {err:.3e}; code mismatches: {code_mismatch} "
      f"of {[a.size for a in codes_np]}", flush=True)
print("DONE")
