import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent.parent))
import os; os.environ.setdefault("JAX_PLATFORMS","cpu")
import dataclasses
import jax; jax.config.update("jax_platforms","cpu")
import numpy as np, jax.numpy as jnp
from nawc_tpu.cli.common import load_audio_batch
from nawc_tpu.models.spread_spectrum import SpreadSpectrumWM
from nawc_tpu.models.psychoacoustic import PsychoacousticWM, bits_to_ints
from nawc_tpu.eval.metrics import lsd, si_snr
from nawc_tpu.attacks import build_suite
from nawc_tpu.utils.ecc import hamming_encode, hamming_soft_decode

wav = load_audio_batch("/root/reference/dataset/LibriSpeech/*.wav", 8, 44_100, 2.0)
wm0 = PsychoacousticWM()
msg = wm0.default_message(wav.shape[0])
coded = hamming_encode(wm0._data_bits(msg)).reshape(wav.shape[0], -1)
suite = build_suite(44_100)
key = jax.random.PRNGKey(0)

def run(alpha, q_hi):
    cfg = dataclasses.replace(wm0.cfg, alpha=alpha, mask_quantile=q_hi)
    core = SpreadSpectrumWM(cfg=cfg, seed=wm0.seed)
    marked = core.embed(wav, coded)
    q_si = float(jnp.mean(si_snr(wav, marked)))
    q_lsd = float(jnp.mean(lsd(wav, marked)))
    def exact(wavx):
        z = core._correlate(wavx)
        d, _ = hamming_soft_decode(z.reshape(z.shape[0], wm0.n_symbols, 12))
        got = bits_to_ints(d.reshape(z.shape[0], -1))
        return float(jnp.mean((got == msg).all(axis=-1).astype(jnp.float32)))
    res = {}
    for name, fn in suite.items():
        res[name] = exact(fn(marked, key))
    surv = np.mean([v for k, v in res.items() if k != "identity"])
    fails = {k: round(v,2) for k, v in res.items() if v < 0.9}
    print(f"a={alpha:<5} qhi={q_hi:<4}: SI={q_si:5.1f} LSD={q_lsd:4.2f} clean={res['identity']:.2f} "
          f"surv19={surv:.3f} fails={fails}", flush=True)


for a, q in [(0.22, 0.85), (0.22, 0.82)]:
    run(a, q)
print("DONE", flush=True)
