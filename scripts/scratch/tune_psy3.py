import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent.parent))
import os; os.environ.setdefault("JAX_PLATFORMS","cpu")
import dataclasses
import jax; jax.config.update("jax_platforms","cpu")
import numpy as np, jax.numpy as jnp
from nawc_tpu.cli.common import load_audio_batch
from nawc_tpu.models.spread_spectrum import SpreadSpectrumWM
from nawc_tpu.models.psychoacoustic import PsychoacousticWM, bits_to_ints
from nawc_tpu.eval.metrics import lsd, si_snr
from nawc_tpu.attacks import dsp
from nawc_tpu.utils.ecc import hamming_encode, hamming_soft_decode

wav = load_audio_batch("/root/reference/dataset/LibriSpeech/*.wav", 8, 44_100, 2.0)
wm0 = PsychoacousticWM()
msg = wm0.default_message(wav.shape[0])
coded = hamming_encode(wm0._data_bits(msg)).reshape(wav.shape[0], -1)

def run(alpha, q_hi, soft=1.0, npass=2):
    cfg = dataclasses.replace(wm0.cfg, alpha=alpha, mask_quantile=q_hi, mask_softness=soft)
    core = SpreadSpectrumWM(cfg=cfg, seed=wm0.seed, n_passes=npass)
    marked = core.embed(wav, coded)
    q_si = float(jnp.mean(si_snr(wav, marked)))
    q_lsd = float(jnp.mean(lsd(wav, marked)))
    def exact(wavx):
        z = core._correlate(wavx)
        d, _ = hamming_soft_decode(z.reshape(z.shape[0], wm0.n_symbols, 12))
        got = bits_to_ints(d.reshape(z.shape[0], -1))
        return float(jnp.mean((got == msg).all(axis=-1).astype(jnp.float32)))
    r = dict(
        clean=exact(marked),
        g40=exact(dsp.gaussian_noise(marked, jax.random.PRNGKey(1), snr_db=40.0)),
        bg25=exact(dsp.background_noise(marked, jax.random.PRNGKey(2), snr_db=25.0)),
        lp=exact(dsp.lowpass(marked, 3500.0, 44100)),
        mp3=exact(dsp.mp3(marked, 44100)),
        q8=exact(dsp.quantization(marked, 8)),
        eq=exact(dsp.eq(marked, jax.random.PRNGKey(3), 44100)),
        rev=exact(dsp.reverb(marked, jax.random.PRNGKey(4), 300.0, 44100)),
    )
    surv = np.mean(list(r.values())[1:])
    print(f"a={alpha:<5} qhi={q_hi:<4} s={soft} np={npass}: SI={q_si:5.1f} LSD={q_lsd:4.2f} " +
          " ".join(f"{k}={v:.2f}" for k, v in r.items()) + f" surv={surv:.2f}", flush=True)

for a, qhi in [(0.24, 0.85), (0.3, 0.85), (0.3, 0.9), (0.4, 0.9), (0.24, 0.8), (0.3, 0.8)]:
    run(a, qhi)
run(0.3, 0.85, npass=3)
print("DONE", flush=True)
