import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent.parent))
import numpy as np, jax, jax.numpy as jnp, time
from nawc_tpu.ops.sswm import _whiten_correlate_pallas, _whiten_correlate_xla, whiten_correlate_reference
print("backend:", jax.default_backend(), flush=True)
OFFS = (17, 23, 29, 37, 47, 53)
b,t,w,k = 16,126,367,16
rng = np.random.default_rng(0)
r = jnp.asarray(rng.standard_normal((b,t,w))*0.3, jnp.float32)
p = jnp.sign(jnp.asarray(rng.standard_normal((k,t,w)), jnp.float32))
ref = np.asarray(whiten_correlate_reference(r,p,OFFS))
t0=time.perf_counter()
got = np.asarray(jax.block_until_ready(_whiten_correlate_pallas(r,p,OFFS)))
print(f"pallas compile+run {time.perf_counter()-t0:.1f}s maxerr={np.abs(got-ref).max():.2e}", flush=True)
t0=time.perf_counter()
gx = np.asarray(jax.block_until_ready(_whiten_correlate_xla(r,p,OFFS)))
print(f"xla compile+run {time.perf_counter()-t0:.1f}s maxerr={np.abs(gx-ref).max():.2e}", flush=True)
for fn,name in [(_whiten_correlate_pallas,"pallas"),(_whiten_correlate_xla,"xla")]:
    out = jax.block_until_ready(fn(r,p,OFFS))
    t0=time.perf_counter()
    for _ in range(50): out = fn(r,p,OFFS)
    jax.block_until_ready(out); dt=(time.perf_counter()-t0)/50
    print(f"{name}: {dt*1e3:.3f} ms", flush=True)
print("DONE", flush=True)
