"""Round-3 imperceptibility tuning under the REFERENCE quality protocol
(16 kHz evaluation, evaluate_quality.py:20-27): alpha/mask sweeps for
psychoacoustic (SilentCipher band: SI>=40, clean exact >=0.99),
chunked + spread_spectrum (WavMark band: SI>=30, survival ~0.8).

Prints one line per config: protocol SI-SNR / LSD / PESQ-proxy, clean
detection, mean survival over the 20-attack suite.
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent.parent))
import os; os.environ.setdefault("JAX_PLATFORMS", "cpu")
import dataclasses
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from nawc_tpu.cli.common import load_audio_batch
from nawc_tpu.models.spread_spectrum import SpreadSpectrumWM
from nawc_tpu.models.psychoacoustic import PsychoacousticWM, bits_to_ints
from nawc_tpu.models.chunked import ChunkedWM
from nawc_tpu.models import random_message
from nawc_tpu.eval.quality import evaluate_pair_batch
from nawc_tpu.attacks import build_suite
from nawc_tpu.utils.config import SpreadSpectrumConfig
from nawc_tpu.utils.ecc import hamming_encode, hamming_soft_decode

key = jax.random.PRNGKey(0)
which = sys.argv[1] if len(sys.argv) > 1 else "all"


def qual(wav, marked, sr):
    cols = evaluate_pair_batch(wav, marked, sr, with_pesq=True)
    return (float(cols["si_snr_watermarked"].mean()), float(cols["lsd"].mean()),
            float(cols["pesq"].mean()), float(cols["stoi"].mean()))


# ---------------- psychoacoustic (44.1k, exact match through Hamming) ----
if which in ("all", "psy"):
    wav44 = load_audio_batch("/root/reference/dataset/LibriSpeech/*.wav", 8, 44_100, 2.0)
    wm0 = PsychoacousticWM()
    msg = wm0.default_message(wav44.shape[0])
    coded = hamming_encode(wm0._data_bits(msg)).reshape(wav44.shape[0], -1)
    suite44 = build_suite(44_100)
    print("== psychoacoustic ==", flush=True)

    def run_psy(alpha, qhi, qlo=0.0):
        cfg = dataclasses.replace(wm0.cfg, alpha=alpha, mask_quantile=qhi,
                                  mask_lo_quantile=qlo)
        core = SpreadSpectrumWM(cfg=cfg, seed=wm0.seed)
        marked = core.embed(wav44, coded)
        si, l, p, st = qual(wav44, marked, 44_100)

        def exact(wavx):
            z = core._correlate(wavx)
            d, _ = hamming_soft_decode(z.reshape(z.shape[0], wm0.n_symbols, 12))
            got = bits_to_ints(d.reshape(z.shape[0], -1))
            return float(jnp.mean((got == msg).all(axis=-1).astype(jnp.float32)))

        res = {n: exact(fn(marked, key)) for n, fn in suite44.items()}
        surv = np.mean([v for k, v in res.items() if k != "identity"])
        fails = {k: round(v, 2) for k, v in res.items() if v < 0.8}
        print(f"a={alpha:<5} qhi={qhi:<4} qlo={qlo:<4}: SI={si:5.1f} LSD={l:5.2f} "
              f"PESQ*={p:4.2f} STOI={st:.3f} clean={res['identity']:.2f} "
              f"surv={surv:.3f} fails={fails}", flush=True)

    for a, qh, ql in [(0.12, 0.0, 0.0), (0.12, 0.85, 0.0), (0.08, 0.85, 0.0),
                      (0.06, 0.85, 0.0), (0.05, 0.8, 0.0), (0.04, 0.8, 0.0),
                      (0.03, 0.0, 0.0)]:
        run_psy(a, qh, ql)

# ---------------- spread_spectrum + chunked (16k, 16-bit) ----------------
if which in ("all", "ss"):
    wav16 = load_audio_batch("/root/reference/dataset/LibriSpeech/*.wav", 8, 16_000, 2.0)
    suite16 = build_suite(16_000)
    print("== spread_spectrum ==", flush=True)

    def run_ss(alpha, qhi):
        wm = SpreadSpectrumWM(cfg=SpreadSpectrumConfig(alpha=alpha, mask_quantile=qhi))
        msg = random_message(key, wav16.shape[0], wm.n_bits)
        marked = wm.embed(wav16, msg)
        si, l, p, st = qual(wav16, marked, 16_000)

        def ba(wavx):
            _, bits = wm.detect(wavx)
            return float(jnp.mean((bits == msg).astype(jnp.float32)))

        res = {n: ba(fn(marked, key)) for n, fn in suite16.items()}
        surv = np.mean([v for k, v in res.items() if k != "identity"])
        pres_mk, _ = wm.detect(marked)
        pres_un, _ = wm.detect(wav16)
        fails = {k: round(v, 2) for k, v in res.items() if v < 0.8}
        print(f"a={alpha:<5} qhi={qhi:<4}: SI={si:5.1f} LSD={l:5.2f} PESQ*={p:4.2f} "
              f"STOI={st:.3f} bit_clean={res['identity']:.3f} bit_surv={surv:.3f} "
              f"pres mk/unmk={float(pres_mk.min()):.2f}/{float(pres_un.max()):.2f} "
              f"fails={fails}", flush=True)

    for a, qh in [(0.1, 0.0), (0.1, 0.85), (0.07, 0.85), (0.05, 0.85), (0.04, 0.8)]:
        run_ss(a, qh)

if which in ("all", "chunked"):
    wav16 = load_audio_batch("/root/reference/dataset/LibriSpeech/*.wav", 8, 16_000, 2.0)
    suite16 = build_suite(16_000)
    print("== chunked ==", flush=True)

    def run_ch(alpha, qhi):
        inner = SpreadSpectrumConfig(alpha=alpha, mask_quantile=qhi)
        wm = ChunkedWM(cfg=inner) if "cfg" in ChunkedWM.__dataclass_fields__ else ChunkedWM()
        msg = random_message(key, wav16.shape[0], wm.n_bits)
        marked = wm.embed(wav16, msg, key)
        si, l, p, st = qual(wav16, marked, 16_000)

        def ba(wavx):
            _, bits = wm.detect(wavx)
            return float(jnp.mean((bits == msg).astype(jnp.float32)))

        res = {n: ba(fn(marked, key)) for n, fn in suite16.items()}
        surv = np.mean([v for k, v in res.items() if k != "identity"])
        fails = {k: round(v, 2) for k, v in res.items() if v < 0.8}
        print(f"a={alpha:<5} qhi={qhi:<4}: SI={si:5.1f} LSD={l:5.2f} PESQ*={p:4.2f} "
              f"STOI={st:.3f} bit_clean={res['identity']:.3f} bit_surv={surv:.3f} "
              f"fails={fails}", flush=True)

    for a, qh in [(0.1, 0.0), (0.1, 0.85), (0.07, 0.85), (0.05, 0.85)]:
        run_ch(a, qh)

print("DONE", flush=True)
