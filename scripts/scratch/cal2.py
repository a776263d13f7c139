import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent.parent))
import os; os.environ.setdefault("JAX_PLATFORMS","cpu")
import jax; jax.config.update("jax_platforms","cpu")
import numpy as np, jax.numpy as jnp
from nawc_tpu.cli.common import load_audio_batch
from nawc_tpu.attacks import dsp
from nawc_tpu.eval.metrics import si_snr
wav = load_audio_batch("/root/reference/dataset/LibriSpeech/*.wav", 8, 16_000, 2.0)
key = jax.random.PRNGKey(0)
def m(name, att):
    print(f"{name:36s} {float(jnp.mean(si_snr(wav, att))):7.1f}", flush=True)
for ms in (0.008, 0.004, 0.012):
    m(f"time_jitter {ms}ms", dsp.time_jitter(wav, key, ms, 16_000))
from nawc_tpu.dsp.resample import resample
from nawc_tpu.utils.padding import fix_length
for num, den in ((10000, 9998), (10000, 9995), (40000, 39996)):
    y = fix_length(resample(wav, num, den), wav.shape[-1])
    m(f"stretch {den/num}", y)
for delay in (80, 160, 320, 476):
    y = dsp.lossy_codec_surrogate(wav, 16_000, bandwidth_hz=0.9*8000, step_db=1.0)
    y = jnp.pad(y, [(0,0),(delay,0)])[..., :wav.shape[-1]]
    m(f"aac delay={delay}", y)
