"""Disposable-process probe for the semantic fly-embed TPU worker crash
(round-3 record: kernel fault at >=16x5s@24k; CLAUDE.md + docs/roadmap.md).

Runs ONE semantic_embed dispatch at a parameterized scale and prints one
line.  Run under `timeout` from a shell loop; a hang/crash costs only this
process.

Usage: python scripts/scratch/semantic_probe.py BATCH SECONDS LSD_WEIGHT [STEPS]
"""

import sys

sys.path.insert(0, "/root/repo")

batch, seconds, lsd_w = int(sys.argv[1]), float(sys.argv[2]), float(sys.argv[3])
steps = int(sys.argv[4]) if len(sys.argv) > 4 else 300

import dataclasses
import time

import jax
import numpy as np

print(f"[probe] backend={jax.default_backend()} batch={batch} sec={seconds} "
      f"lsd={lsd_w} steps={steps}", flush=True)

from nawc_tpu.cli.common import load_audio_batch, load_codec
from nawc_tpu.models.semantic import _DEFAULT_CFGS, SemanticWM

codec = load_codec("checkpoints/codec_24k.msgpack", "full")
cfg = dataclasses.replace(_DEFAULT_CFGS["kmeans"], lsd_weight=lsd_w, steps=steps)
wm = SemanticWM(codec, "kmeans", cfg=cfg)
wav = load_audio_batch("/root/reference/dataset/LibriSpeech/*.wav", batch,
                       wm.sample_rate, seconds)
print(f"[probe] wav {wav.shape} loaded; dispatching embed", flush=True)
t0 = time.perf_counter()
marked = wm.embed(wav)
marked_np = np.asarray(marked)  # d2h fetch = the only trusted barrier
t1 = time.perf_counter()
assert np.isfinite(marked_np).all()
score = np.asarray(wm.score(marked))
print(f"[probe] OK embed {t1 - t0:.1f}s score_mean={score.mean():.3f} "
      f"max|delta|={np.abs(marked_np - np.asarray(wav)).max():.5f}", flush=True)
