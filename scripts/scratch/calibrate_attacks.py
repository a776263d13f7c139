import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent.parent))
import os; os.environ.setdefault("JAX_PLATFORMS","cpu")
import jax; jax.config.update("jax_platforms","cpu")
import numpy as np, jax.numpy as jnp
from nawc_tpu.cli.common import load_audio_batch
from nawc_tpu.attacks import build_suite
from nawc_tpu.eval.metrics import si_snr

ANCHOR = {  # audioseal_stats_loose sisnr_attack_mean
 "background_noise":46.9,"dynamic_range_compression":35.2,"dynamic_range_expansion":26.2,
 "eq":11.5,"gain":81.6,"gaussian_noise":51.2,"highpass":2.2,"limiter":21.5,"lowpass":24.4,
 "mp3":30.5,"quantization":63.4,"reverb":9.3,"time_jitter":32.9,"vorbis":19.6,"aac":-28.7,
 "phase_shift":-22.8,"polarity":90.3,"time_stretch":-2.1}

wav = load_audio_batch("/root/reference/dataset/LibriSpeech/*.wav", 8, 16_000, 2.0)
suite = build_suite(16_000)
key = jax.random.PRNGKey(0)
print(f"{'attack':28s} {'ours':>7s} {'anchor':>7s}")
for name, fn in suite.items():
    if name == "identity": continue
    att = fn(wav, key)
    s = float(jnp.mean(si_snr(wav, att)))
    a = ANCHOR.get(name, float('nan'))
    flag = "  <-- recalibrate" if (a == a and abs(s - a) > 5) else ""
    print(f"{name:28s} {s:7.1f} {a:7.1f}{flag}")
