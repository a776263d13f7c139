import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent.parent))
import numpy as np, jax, jax.numpy as jnp, time
from nawc_tpu.ops.sswm import _whiten_correlate_pallas, _whiten_correlate_xla, whiten_correlate_reference
print("backend:", jax.default_backend())
OFFS = (17, 23, 29, 37, 47, 53)
for (b,t,w,k,tag) in [(16,126,367,16,"2s-showcase"), (16,376,367,16,"4s-bench"), (3,77,130,16,"odd")]:
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.standard_normal((b,t,w))*0.3, jnp.float32)
    p = jnp.sign(jnp.asarray(rng.standard_normal((k,t,w)), jnp.float32))
    ref = np.asarray(whiten_correlate_reference(r,p,OFFS))
    got = np.asarray(jax.block_until_ready(_whiten_correlate_pallas(r,p,OFFS)))
    gx  = np.asarray(jax.block_until_ready(_whiten_correlate_xla(r,p,OFFS)))
    err = np.abs(got-ref).max(); errx = np.abs(gx-ref).max()
    # timing
    for fn,name in [(_whiten_correlate_pallas,"pallas"),(_whiten_correlate_xla,"xla")]:
        out = jax.block_until_ready(fn(r,p,OFFS))
        t0=time.perf_counter()
        for _ in range(20): out = fn(r,p,OFFS)
        jax.block_until_ready(out); dt=(time.perf_counter()-t0)/20
        print(f"{tag} {name}: {dt*1e3:.3f} ms")
    print(f"{tag}: pallas_maxerr={err:.2e} xla_maxerr={errx:.2e}")
print("OK")
