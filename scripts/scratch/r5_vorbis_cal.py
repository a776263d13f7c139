"""Round-5: calibrate the dithered vorbis surrogate severity + payload check.

Anchor: reference vorbis sisnr_attack 19.6-21.3 dB (stats_by_attack.csv).
Also measures spread_spectrum + neural bit survival under old (deterministic
rounding) vs new (subtractive dither) at the calibrated step_db.

  python scripts/scratch/r5_vorbis_cal.py
"""
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from nawc_tpu.attacks.dsp import lossy_codec_surrogate, vorbis
from nawc_tpu.cli.common import DEFAULT_AUDIO_GLOB, build_watermarkers, load_audio_batch
from nawc_tpu.eval.metrics import si_snr
from nawc_tpu.models.base import random_message

wav = load_audio_batch(DEFAULT_AUDIO_GLOB, 16, 16_000, 4.0)
key = jax.random.PRNGKey(0)

print("severity (sisnr_attack on clean clips), anchor 19.6-21.3 dB:")
for step_db in [3.5, 4.0, 4.5, 5.0]:
    y = vorbis(wav, key, 16_000, step_db=step_db)
    print(f"  dithered step_db={step_db}: {np.asarray(si_snr(wav, y)).mean():.1f} dB")
y_old = lossy_codec_surrogate(wav, 16_000, bandwidth_hz=0.85 * 8000, step_db=4.5)
print(f"  old deterministic 4.5:   {np.asarray(si_snr(wav, y_old)).mean():.1f} dB")

for m in ["spread_spectrum", "chunked", "neural"]:
    wm = build_watermarkers([m], None)[m]
    msg = random_message(key, 16, wm.n_bits)
    marked = wm.embed(wav, msg, key)

    def bits_under(att):
        _, b = wm.detect(att)
        return float(jnp.mean((b == msg).astype(jnp.float32)))

    print(f"{m}: clean={bits_under(marked):.3f} "
          f"old_vorbis={bits_under(lossy_codec_surrogate(marked, 16_000, bandwidth_hz=0.85*8000, step_db=4.5)):.3f} "
          f"new_vorbis={bits_under(vorbis(marked, key, 16_000)):.3f}", flush=True)
