"""Round-5 probe: token_green permutation-null z detection at 5 s.

Embeds N clips at 24 kHz, reports the z-score (new detect statistic) and the
raw green ratio (reference statistic) for marked / clean / SNAC-roundtripped
audio.  Disposable probe per CLAUDE.md bounded-dispatch discipline.

  python scripts/scratch/r5_token_probe.py [n_clips] [steps]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from nawc_tpu.cli.common import DEFAULT_AUDIO_GLOB, build_watermarkers, load_audio_batch, load_codec

n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 300

codec = load_codec("checkpoints/codec_24k.msgpack", "full")
wav = load_audio_batch(DEFAULT_AUDIO_GLOB, n, 24_000, 5.0)
import dataclasses

wm = build_watermarkers(["token_green"], codec)["token_green"]
wm = dataclasses.replace(wm, steps=steps)

t0 = time.time()
marked = jax.block_until_ready(wm.embed(wav))
print(f"embed {n}x5s steps={steps}: {time.time()-t0:.0f}s wall")

from nawc_tpu.attacks.codec import codec_roundtrip
from nawc_tpu.eval.metrics import si_snr

rt = codec_roundtrip(codec, marked, in_sr=24_000)
for name, x in [("marked", marked), ("clean", wav), ("snac_rt", rt)]:
    z4 = np.asarray(wm.score(x))
    r = np.asarray(wm.green_ratio(x))
    print(f"{name:8s} z/4: mean={z4.mean():.3f} min={z4.min():.3f} max={z4.max():.3f} | "
          f"ratio: mean={r.mean():.3f} min={r.min():.3f} max={r.max():.3f}")
print("sisnr_wm", np.asarray(si_snr(wav, marked)).mean().round(2))
