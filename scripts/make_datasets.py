"""Build a multi-corpus evaluation tree under data/datasets/ from what the
image actually contains (the reference sweeps ~11 corpora,
``watermark_testing.py:957-970``; this environment ships exactly one —
LibriSpeech, 124 wavs, 2 speakers).

Corpora produced (provenance labeled, nothing pretends to be what it isn't):
  * libri_spk84   — the 65 LibriSpeech clips of speaker 84 (real speech)
  * libri_spk174  — the 59 LibriSpeech clips of speaker 174 (real speech)
  * libri_reverb  — speaker-84 clips convolved with a synthetic 250 ms RIR
                    (derived: reverberant-speech corpus)
  * libri_noisy   — speaker-174 clips + speech-shaped noise at 12 dB SNR
                    (derived: noisy-speech corpus, round 5)
  * synth_tones   — synthetic harmonic instrument-like clips (chord stacks,
                    vibrato, AD envelopes; stands in for the reference's
                    music/instrument corpora)

Usage: python scripts/make_datasets.py [--out data/datasets]
"""

from __future__ import annotations

import argparse
import glob
import shutil
from pathlib import Path

import numpy as np

import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/reference/dataset/LibriSpeech"


def synth_tone_clip(rng: np.random.Generator, seconds: float, sr: int) -> np.ndarray:
    """One instrument-ish clip: 3-6 note events, each a harmonic stack with
    vibrato and an attack-decay envelope, plus a -45 dB noise floor."""
    t = np.arange(int(seconds * sr)) / sr
    out = np.zeros_like(t)
    for _ in range(rng.integers(3, 7)):
        f0 = float(rng.uniform(80.0, 900.0))
        start = float(rng.uniform(0.0, seconds * 0.7))
        dur = float(rng.uniform(0.4, seconds - start))
        n_harm = int(rng.integers(3, 9))
        vib = 1.0 + 0.004 * np.sin(2 * np.pi * rng.uniform(4.0, 7.0) * t)
        note = np.zeros_like(t)
        for h in range(1, n_harm + 1):
            amp = rng.uniform(0.3, 1.0) / h
            note += amp * np.sin(2 * np.pi * f0 * h * vib * t + rng.uniform(0, 2 * np.pi))
        env = np.clip((t - start) / 0.02, 0.0, 1.0) * np.exp(-np.maximum(t - start, 0.0) / (dur * 0.4))
        env *= (t >= start) & (t <= start + dur)
        out += note * env
    out += 0.005 * rng.standard_normal(len(t))
    peak = np.abs(out).max() + 1e-9
    return (0.5 * out / peak).astype(np.float32)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="data/datasets")
    ap.add_argument("--tone_count", type=int, default=60)
    ap.add_argument("--tone_seconds", type=float, default=8.0)
    ap.add_argument("--sr", type=int, default=16_000)
    args = ap.parse_args()

    from nawc_tpu.utils import audio_io

    out = Path(args.out)
    rng = np.random.default_rng(42)

    # speaker splits (copies keep the source untouched)
    for spk, name in ((84, "libri_spk84"), (174, "libri_spk174")):
        dest = out / name
        dest.mkdir(parents=True, exist_ok=True)
        files = sorted(glob.glob(f"{SRC}/{spk}-*.wav"))
        for f in files:
            shutil.copy2(f, dest / Path(f).name)
        print(f"[datasets] {name}: {len(files)} files")

    # reverberant speech: synthetic exponentially-decaying-noise RIR
    dest = out / "libri_reverb"
    dest.mkdir(parents=True, exist_ok=True)
    n_ir = int(0.25 * args.sr)
    tt = np.arange(n_ir) / args.sr
    ir = rng.standard_normal(n_ir) * np.exp(-tt / (0.25 / 6.9))
    ir[0] = 1.0
    ir /= np.sqrt((ir**2).sum())
    files = sorted(glob.glob(f"{SRC}/84-*.wav"))
    for f in files:
        a, sr = audio_io.read_wav(f)
        x = a.mean(axis=0)
        wet = np.convolve(x, ir)[: len(x)].astype(np.float32)
        y = 0.7 * x + 0.3 * wet
        audio_io.write_wav(dest / Path(f).name, y[None, :], sr)
    print(f"[datasets] libri_reverb: {len(files)} files")

    # noisy speech: speech-shaped (lowpassed) noise at 12 dB SNR
    dest = out / "libri_noisy"
    dest.mkdir(parents=True, exist_ok=True)
    files = sorted(glob.glob(f"{SRC}/174-*.wav"))
    lp = np.hamming(101) * np.sinc(0.25 * (np.arange(101) - 50))
    lp /= lp.sum()
    for f in files:
        a, sr = audio_io.read_wav(f)
        x = a.mean(axis=0)
        n = np.convolve(rng.standard_normal(len(x)), lp, mode="same")
        n *= np.sqrt((x**2).mean() / ((n**2).mean() + 1e-12) * 10 ** (-12 / 10))
        audio_io.write_wav(dest / Path(f).name, (x + n)[None, :].astype(np.float32), sr)
    print(f"[datasets] libri_noisy: {len(files)} files")

    # synthetic instrument-like corpus
    dest = out / "synth_tones"
    dest.mkdir(parents=True, exist_ok=True)
    for i in range(args.tone_count):
        clip = synth_tone_clip(rng, args.tone_seconds, args.sr)
        audio_io.write_wav(dest / f"tone_{i:03d}.wav", clip[None, :], args.sr)
    print(f"[datasets] synth_tones: {args.tone_count} files")
    print(f"[datasets] tree ready at {out}")


if __name__ == "__main__":
    main()
