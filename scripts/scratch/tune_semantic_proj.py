"""Sweep the spectral-projection headroom for the semantic embed (round-4
crash-safe shaping) at the SAFE batch scale (8 x 5 s; the 16 x 5 s crash
threshold is documented in docs/roadmap.md).

For each config: embed, then report the detection z (score/score_scale),
24 kHz-native LSD, and SI-SNR vs clean.

Usage: python scripts/scratch/tune_semantic_proj.py [axis_kind]
"""

import sys

sys.path.insert(0, "/root/repo")

import dataclasses
import time

import numpy as np

axis_kind = sys.argv[1] if len(sys.argv) > 1 else "kmeans"

from nawc_tpu.cli.common import load_audio_batch, load_codec
from nawc_tpu.eval.metrics import lsd, si_snr
from nawc_tpu.models.semantic import _DEFAULT_CFGS, SemanticWM

codec = load_codec("checkpoints/codec_24k.msgpack", "full")
base = _DEFAULT_CFGS[axis_kind]
wav = load_audio_batch("/root/reference/dataset/LibriSpeech/*.wav", 8, 24_000, 5.0)

configs = [
    ("off", dataclasses.replace(base, lsd_weight=0.0)),
    ("h0_p4", dataclasses.replace(base, lsd_weight=1.0, proj_headroom_db=0.0, n_proj_phases=4)),
    ("h3_p4", dataclasses.replace(base, lsd_weight=1.0, proj_headroom_db=3.0, n_proj_phases=4)),
    ("h6_p4", dataclasses.replace(base, lsd_weight=1.0, proj_headroom_db=6.0, n_proj_phases=4)),
    ("h10_p4", dataclasses.replace(base, lsd_weight=1.0, proj_headroom_db=10.0, n_proj_phases=4)),
]

for name, cfg in configs:
    wm = SemanticWM(codec, axis_kind, cfg=cfg)
    t0 = time.perf_counter()
    marked = wm.embed(wav)
    marked_np = np.asarray(marked)
    dt = time.perf_counter() - t0
    z = np.asarray(wm.score(marked)) / cfg.score_scale
    l = np.asarray(lsd(wav, marked))
    s = np.asarray(si_snr(wav, marked))
    zc = np.asarray(wm.score(wav)) / cfg.score_scale
    print(f"[{name:7s}] z={z.mean():5.2f}(min {z.min():5.2f}) clean_z={zc.mean():5.2f} "
          f"LSD={l.mean():5.2f} SI-SNR={s.mean():5.1f}dB t={dt:5.1f}s", flush=True)
