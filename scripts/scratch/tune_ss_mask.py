"""Level-mask tuning for the spread-spectrum family: quality (SI-SNR/LSD/
PESQ-proxy) vs reliability (BER / exact match, clean + attacked)."""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent.parent))
import os; os.environ.setdefault("JAX_PLATFORMS","cpu")
import dataclasses
import jax; jax.config.update("jax_platforms","cpu")
import numpy as np, jax.numpy as jnp
from nawc_tpu.cli.common import load_audio_batch
from nawc_tpu.models.spread_spectrum import SpreadSpectrumWM
from nawc_tpu.models.psychoacoustic import PsychoacousticWM
from nawc_tpu.models import random_message
from nawc_tpu.eval.metrics import lsd, si_snr
from nawc_tpu.eval.pesq_proxy import pesq_proxy
from nawc_tpu.attacks import dsp

def quality(wav, marked, sr):
    q_lsd = float(jnp.mean(lsd(wav, marked)))
    q_si = float(jnp.mean(si_snr(wav, marked)))
    q_pesq = float(np.mean([pesq_proxy(np.asarray(wav[i]), np.asarray(marked[i]), sr) for i in range(wav.shape[0])]))
    return q_si, q_lsd, q_pesq

key = jax.random.PRNGKey(0)

# ---------------- psychoacoustic (44.1k, exact match) ----------------
wav44 = load_audio_batch("/root/reference/dataset/LibriSpeech/*.wav", 8, 44_100, 2.0)
print("== psychoacoustic ==", flush=True)
for alpha, q in [(0.12, 0.0), (0.12, 0.85), (0.12, 0.75), (0.16, 0.85), (0.16, 0.75), (0.20, 0.80)]:
    wm = PsychoacousticWM(alpha=alpha)
    if q > 0:
        wm = dataclasses.replace(wm, alpha=alpha)
        object.__setattr__(wm, "_mask_q", q)  # hack? no - cfg path below
    # build via cfg override: PsychoacousticWM.cfg is a property; use dataclass replace on the cfg? cfg derived. Use subclass-free: monkey via dataclasses.replace not possible. Use core directly:
    cfg = dataclasses.replace(wm.cfg, mask_quantile=q)
    core = SpreadSpectrumWM(cfg=cfg, seed=wm.seed)
    from nawc_tpu.utils.ecc import hamming_encode
    msg = wm.default_message(wav44.shape[0])
    data = wm._data_bits(msg)
    coded = hamming_encode(data).reshape(wav44.shape[0], -1)
    marked = core.embed(wav44, coded)
    q_si, q_lsd, q_pesq = quality(wav44, marked, 44100)
    # detect via soft ML on core z
    from nawc_tpu.utils.ecc import hamming_soft_decode
    def exact(wavx):
        z = core._correlate(wavx)
        d, _ = hamming_soft_decode(z.reshape(z.shape[0], wm.n_symbols, 12))
        from nawc_tpu.models.psychoacoustic import bits_to_ints
        got = bits_to_ints(d.reshape(z.shape[0], -1))
        want = msg
        return float(jnp.mean((got == want).all(axis=-1).astype(jnp.float32)))
    em_clean = exact(marked)
    em_noise = exact(dsp.gaussian_noise(marked, jax.random.PRNGKey(1), snr_db=30.0))
    em_lp = exact(dsp.lowpass(marked, 3500.0, 44100))
    em_mp3 = exact(dsp.mp3(marked, 44100))
    print(f"alpha={alpha} q={q}: SI-SNR={q_si:5.1f} LSD={q_lsd:5.2f} PESQ*={q_pesq:4.2f} "
          f"exact clean/noise30/lp/mp3 = {em_clean:.2f}/{em_noise:.2f}/{em_lp:.2f}/{em_mp3:.2f}", flush=True)

# ---------------- spread_spectrum (16k, 16-bit BER) ----------------
wav16 = load_audio_batch("/root/reference/dataset/LibriSpeech/*.wav", 8, 16_000, 2.0)
print("== spread_spectrum ==", flush=True)
from nawc_tpu.utils.config import SpreadSpectrumConfig
for alpha, q in [(0.06, 0.0), (0.06, 0.85), (0.08, 0.85), (0.10, 0.80), (0.10, 0.85)]:
    wm = SpreadSpectrumWM(cfg=SpreadSpectrumConfig(alpha=alpha, mask_quantile=q))
    msg = random_message(key, wav16.shape[0], wm.n_bits)
    marked = wm.embed(wav16, msg)
    q_si, q_lsd, q_pesq = quality(wav16, marked, 16000)
    def ber(wavx):
        _, bits = wm.detect(wavx)
        return float(jnp.mean((bits != msg).astype(jnp.float32)))
    b_clean = ber(marked)
    b_noise = ber(dsp.gaussian_noise(marked, jax.random.PRNGKey(1), snr_db=30.0))
    b_mp3 = ber(dsp.mp3(marked, 16000))
    pres_un, _ = wm.detect(wav16)
    pres_mk, _ = wm.detect(marked)
    print(f"alpha={alpha} q={q}: SI-SNR={q_si:5.1f} LSD={q_lsd:5.2f} PESQ*={q_pesq:4.2f} "
          f"BER clean/noise30/mp3 = {b_clean:.3f}/{b_noise:.3f}/{b_mp3:.3f} "
          f"presence mk/unmk = {float(pres_mk.min()):.2f}/{float(pres_un.max()):.2f}", flush=True)
print("DONE", flush=True)
