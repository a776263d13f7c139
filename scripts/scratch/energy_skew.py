import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent.parent))
import os; os.environ.setdefault("JAX_PLATFORMS","cpu")
import jax; jax.config.update("jax_platforms","cpu")
import numpy as np, jax.numpy as jnp
from nawc_tpu.cli.common import load_audio_batch
from nawc_tpu.dsp.stft import stft
from nawc_tpu.utils.config import StftConfig

wav = load_audio_batch("/root/reference/dataset/LibriSpeech/*.wav", 8, 16_000, 2.0)
spec = stft(wav, StftConfig(1024, 256, 1024))
# band 400-6000 Hz like SpreadSpectrumConfig
lo, hi = 26, 384
p = np.asarray(jnp.abs(spec[..., lo:hi]))**2  # (B, T, W)
for q in [0.5, 0.7, 0.8, 0.85, 0.9, 0.95]:
    # fraction of energy in bins BELOW the q-quantile of log-mag
    fracs = []
    for b in range(p.shape[0]):
        x = p[b].ravel()
        thr = np.quantile(x, q)
        fracs.append(x[x <= thr].sum() / x.sum())
    print(f"q={q}: bins<=q carry {np.mean(fracs)*100:5.2f}% of band energy "
          f"-> masking top {100*(1-q):.0f}% of bins removes {100*(1-np.mean(fracs)):5.2f}% of residual energy "
          f"= {-10*np.log10(np.mean(fracs)) if np.mean(fracs)>0 else 0:.2f} dB ... "
          f"SI-SNR gain if residual prop to |X|^2: {-10*np.log10(1-( 1-np.mean(fracs))):0.2f}")
# more precisely: multiplicative residual energy per bin ∝ |X|^2; masking top (1-q) of bins
# leaves residual energy = sum_{below} |X|^2 → gain_dB = 10 log10(total/below)
for q in [0.7, 0.8, 0.85, 0.9]:
    gains = []
    for b in range(p.shape[0]):
        x = p[b].ravel(); thr = np.quantile(x, q)
        gains.append(10*np.log10(x.sum() / max(x[x <= thr].sum(), 1e-30)))
    print(f"q={q}: SI-SNR gain from masking top {100*(1-q):.0f}% loudest bins: {np.mean(gains):5.2f} dB (cell loss {100*(1-q):.0f}%)")
