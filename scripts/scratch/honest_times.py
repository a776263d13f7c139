"""Ground-truth stage timings: d2h scalar fetch as the only trusted barrier."""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent.parent))
import time, numpy as np, jax, jax.numpy as jnp
from nawc_tpu.codec import make_codec
from nawc_tpu.models import SpreadSpectrumWM
from nawc_tpu.utils.config import CodecConfig, SpreadSpectrumConfig

def sync(x):
    return float(np.asarray(jnp.sum(x.astype(jnp.float32) if x.dtype != jnp.float32 else x)))

rng = np.random.default_rng(0)
for tag, dt in [("f32", "float32"), ("bf16", "bfloat16")]:
    cfg = CodecConfig(compute_dtype=dt)
    codec = make_codec(jax.random.PRNGKey(0), cfg)
    sr = cfg.sample_rate
    wm = SpreadSpectrumWM(cfg=SpreadSpectrumConfig(sample_rate=sr, band_hi_hz=9000.0, alpha=0.1))
    wav = jnp.asarray(rng.normal(size=(16, sr*4)).astype(np.float32)*0.1)
    msg = jnp.asarray(rng.integers(0, 2, (16, wm.n_bits)), jnp.int32)
    # warm compiles + drain
    marked = wm.embed(wav, msg); codes = codec.encode(marked); det = wm.detect(marked)
    sync(marked); sync(codes[0]); sync(det[0])
    def timed(step, x0, iters=8):
        x = x0; sync(x)
        t0 = time.perf_counter()
        for _ in range(iters):
            x = step(x)
        sync(x)
        return (time.perf_counter() - t0) / iters * 1e3
    enc_ms = timed(lambda x: x * (1.0 + jnp.mean(codec.encode(x)[0].astype(jnp.float32)) * 1e-6), marked * 1.0003)
    emb_ms = timed(lambda x: jnp.roll(wm.embed(x, msg), 1, axis=0), wav * 1.0003)
    det_ms = timed(lambda x: x * (1.0 + jnp.mean(wm.detect(x)[0]) * 1e-5), marked * 1.0007)
    print(f"[{tag}] embed={emb_ms:.1f} ms encode={enc_ms:.1f} ms detect={det_ms:.1f} ms "
          f"-> pipeline~{emb_ms+enc_ms+det_ms:.1f} ms = {64e3/(emb_ms+enc_ms+det_ms):,.0f}x rt", flush=True)
print("DONE")
