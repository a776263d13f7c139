"""Quickstart: embed a 16-bit message, attack it, detect it, inspect it.

Run:  python examples/quickstart.py
"""

import glob

import jax
import jax.numpy as jnp
import numpy as np

from nawc_tpu.attacks import build_suite
from nawc_tpu.dsp import resample
from nawc_tpu.eval import si_snr
from nawc_tpu.interp import input_gradient
from nawc_tpu.models import SpreadSpectrumWM, bit_accuracy, random_message
from nawc_tpu.utils import audio_io

# --- load a batch of speech at the watermark's rate -------------------------
files = sorted(glob.glob("/root/reference/dataset/LibriSpeech/*.wav"))[:4]
clips = []
for f in files:
    audio, sr = audio_io.read_wav(f)
    x = resample(jnp.asarray(audio.mean(axis=0)), sr, 16_000)[:32_000]
    clips.append(np.pad(np.asarray(x), (0, max(0, 32_000 - x.shape[-1]))))
wav = jnp.asarray(np.stack(clips))

# --- embed ------------------------------------------------------------------
wm = SpreadSpectrumWM()
msg = random_message(jax.random.PRNGKey(0), wav.shape[0], wm.n_bits)
marked = wm.embed(wav, msg)
print("imperceptibility (SI-SNR dB):", np.asarray(si_snr(wav, marked)).round(1))

# --- attack + detect --------------------------------------------------------
suite = build_suite(sr=16_000)
for attack in ("identity", "gaussian_noise", "mp3", "lowpass"):
    attacked = suite[attack](marked, jax.random.PRNGKey(1))
    presence, bits = wm.detect(attacked)
    acc = bit_accuracy(bits, msg)
    print(f"{attack:16s} presence={np.asarray(presence).mean():.3f} "
          f"bit_acc={np.asarray(acc).mean():.3f}")

# --- shift robustness -------------------------------------------------------
shifted = jnp.roll(marked, 5000, axis=-1)
presence, bits, lag = wm.detect_sync(shifted)
print(f"after 5000-sample shift: acc={np.asarray(bit_accuracy(bits, msg)).mean():.3f} "
      f"recovered lag={np.asarray(lag)[0]} frames")

# --- interpretability: where does the detector look? ------------------------
sal = input_gradient(lambda w: wm.score(w, msg), marked)
print("saliency energy in the embedding band vs outside:",
      float(jnp.sum(sal**2) / (jnp.sum(marked**2) + 1e-9)))
