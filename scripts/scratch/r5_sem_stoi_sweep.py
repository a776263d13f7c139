"""Round-5 sweep: semantic STOI vs proj_stoi_extra_db.

VERDICT r4 #5: semantic exact-STOI target >= 0.97 at pass rate 1.00 and
16 kHz-protocol LSD <= 7.  The suspected cause of the 0.90 reading is the
0 dB per-bin headroom inside STOI's envelope bands; this sweeps the new
`proj_stoi_extra_db` cap on 8 x 5 s clips and reports z / STOI(exact) /
LSD(16k protocol) / SI-SNR per setting.

  python scripts/scratch/r5_sem_stoi_sweep.py [extra_db ...]
"""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from nawc_tpu.cli.common import DEFAULT_AUDIO_GLOB, build_watermarkers, load_audio_batch, load_codec
from nawc_tpu.dsp.resample import resample
from nawc_tpu.eval.metrics import lsd, si_snr
from nawc_tpu.eval.stoi_exact import stoi_exact_batch
from nawc_tpu.models.semantic import _DEFAULT_CFGS, semantic_embed, semantic_score

extras = [float(a) for a in sys.argv[1:]] or [0.0, 6.0, 10.0, 14.0]
n = 8
codec = load_codec("checkpoints/codec_24k.msgpack", "full")
wav = load_audio_batch(DEFAULT_AUDIO_GLOB, n, 24_000, 5.0)
wm = build_watermarkers(["semantic_cluster"], codec)["semantic_cluster"]
axis = wm.axis

w16 = np.asarray(resample(wav, 24_000, 16_000))
for extra in extras:
    scfg = dataclasses.replace(_DEFAULT_CFGS["kmeans"], proj_stoi_extra_db=extra)
    t0 = time.time()
    marked = jax.block_until_ready(
        semantic_embed(codec.cfg, scfg, codec.params, axis, wav))
    z = np.asarray(semantic_score(codec.cfg, scfg, codec.params, axis, marked))
    zc = np.asarray(semantic_score(codec.cfg, scfg, codec.params, axis, wav))
    m16 = np.asarray(resample(marked, 24_000, 16_000))
    st = stoi_exact_batch(w16, m16, 16_000)
    l16 = np.asarray(lsd(jnp.asarray(w16), jnp.asarray(m16)))
    snr_ = np.asarray(si_snr(wav, marked))
    print(
        f"extra={extra:5.1f}dB  z:mean={z.mean():.2f} min={z.min():.2f} "
        f"(clean {zc.mean():.2f})  pass@.85={(z > 0.85).mean():.2f}  "
        f"STOI={st.mean():.4f}/{st.min():.4f}  LSD16={l16.mean():.2f}  "
        f"SI-SNR={snr_.mean():.1f}  [{time.time()-t0:.0f}s]", flush=True,
    )
