"""Compare neural WM checkpoints on a small robustness sweep (promotion
gate for the round-4 retrain).

Usage: python scripts/scratch/eval_neural_ckpt.py ckptA [ckptB ...]
"""

import sys

sys.path.insert(0, "/root/repo")

import dataclasses

import jax
import numpy as np

from nawc_tpu.attacks import build_suite
from nawc_tpu.cli.common import load_audio_batch, load_codec
from nawc_tpu.eval.robustness import run_robustness
from nawc_tpu.models import init_neural_wm
from nawc_tpu.utils.checkpoint import load_params

codec = load_codec("checkpoints/codec_24k.msgpack", "full")
wav = load_audio_batch("/root/reference/dataset/LibriSpeech/*.wav", 16, 16_000, 4.0)
clips = [np.asarray(wav[i]) for i in range(wav.shape[0])]
suite = build_suite(16_000, codec)
suite.pop("identity", None)

sync = "--sync" in sys.argv
args = [a for a in sys.argv[1:] if a != "--sync"]
for ckpt in args:
    wm = init_neural_wm(jax.random.PRNGKey(0))
    blob = load_params(ckpt, {"gen": wm.gen_params, "det": wm.det_params})
    wm = dataclasses.replace(wm, gen_params=blob["gen"], det_params=blob["det"])
    df = run_robustness(wm, suite, clips, 16_000, chunk_seconds=2.0, sync=sync)
    by = df.groupby("attack_type")[["bitwise/distorted", "hard/distorted"]].mean()
    print(f"\n=== {ckpt} sync={sync} ===")
    print(f"bitwise/clean      {df['bitwise/clean'].mean():.4f}")
    print(f"bitwise/distorted  {df['bitwise/distorted'].mean():.4f}")
    print(f"hard/clean         {df['hard/clean'].mean():.4f}")
    print(f"hard/distorted     {df['hard/distorted'].mean():.4f}")
    print(f"sisnr_wm           {df['sisnr_wm'].mean():.2f} dB")
    print("worst attacks:")
    print(by.sort_values("bitwise/distorted").head(6).round(3).to_string())
