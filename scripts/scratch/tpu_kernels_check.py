"""Hardware exactness check for both Pallas kernels (VERDICT r2 #1, weak #8)."""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent.parent))
import numpy as np, jax, jax.numpy as jnp, time
print("backend:", jax.default_backend(), flush=True)

# ---- sswm whiten_correlate at production shapes
from nawc_tpu.ops.sswm import _whiten_correlate_pallas, _whiten_correlate_xla, whiten_correlate_reference
OFFS = (17, 23, 29, 37, 47, 53)
for (b,t,w,k,tag) in [(16,376,367,16,"4s-bench"), (3,77,130,16,"odd"), (16,126,367,16,"2s-showcase")]:
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.standard_normal((b,t,w))*0.3, jnp.float32)
    p = jnp.sign(jnp.asarray(rng.standard_normal((k,t,w)), jnp.float32))
    ref = np.asarray(whiten_correlate_reference(r,p,OFFS))
    got = np.asarray(jax.block_until_ready(_whiten_correlate_pallas(r,p,OFFS)))
    gx  = np.asarray(jax.block_until_ready(_whiten_correlate_xla(r,p,OFFS)))
    e1, e2 = np.abs(got-ref).max(), np.abs(gx-ref).max()
    ok = "OK" if (e1 < 1e-2 and e2 < 1e-2) else "FAIL"
    # timing
    ts = {}
    for fn,name in [(_whiten_correlate_pallas,"pallas"),(_whiten_correlate_xla,"xla")]:
        out = jax.block_until_ready(fn(r,p,OFFS)); t0=time.perf_counter()
        for _ in range(50): out = fn(r,p,OFFS)
        jax.block_until_ready(out); ts[name]=(time.perf_counter()-t0)/50*1e3
    print(f"sswm {tag}: pallas_err={e1:.2e} xla_err={e2:.2e} {ok} pallas={ts['pallas']:.3f}ms xla={ts['xla']:.3f}ms", flush=True)

# ---- rvq_encode_fused on the trained codec checkpoint at production shapes
from nawc_tpu.codec import make_codec
from nawc_tpu.utils.config import CodecConfig
from nawc_tpu.ops.rvq_fused import rvq_encode_fused, rvq_encode_reference
cfg = CodecConfig()
codec = make_codec(jax.random.PRNGKey(0), cfg)
try:
    from nawc_tpu.utils.checkpoint import load_params
    params = load_params("checkpoints/codec_24k.msgpack", codec.params)
    print("loaded trained codec ckpt", flush=True)
except Exception as e:
    params = codec.params; print("random params:", e, flush=True)
strides = cfg.vq_strides if hasattr(cfg, "vq_strides") else (4,2,1)
rng = np.random.default_rng(1)
for t_lat, tag in [(256, "1s"), (768, "4s")]:
    z = jnp.asarray(rng.standard_normal((8, t_lat, cfg.latent_dim)).astype(np.float32))
    ref = [np.asarray(c) for c in rvq_encode_reference(z, params, strides)]
    got = [np.asarray(jax.block_until_ready(c)) for c in rvq_encode_fused(z, params, strides, use_pallas=True)]
    mism = [int((a!=b).sum()) for a,b in zip(ref,got)]
    tot = [a.size for a in ref]
    print(f"rvq {tag}: code mismatches per level {mism} of {tot} -> {'OK' if sum(mism)==0 else 'CHECK'}", flush=True)
print("DONE", flush=True)
