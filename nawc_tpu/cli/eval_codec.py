"""Evaluate a trained codec checkpoint: reconstruction quality (mel distance,
SI-SNR, LSD, STOI) and codebook utilization on held-out clips
(BASELINE config #2).

Usage:
  python -m nawc_tpu.cli.eval_codec --ckpt checkpoints/codec_24k.msgpack --filecount 8
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None) -> None:
    from .common import DEFAULT_AUDIO_GLOB, load_audio_batch, load_codec

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", default="checkpoints/codec_24k.msgpack")
    ap.add_argument("--size", choices=["full", "small"], default="full")
    ap.add_argument("--audio_glob", default=DEFAULT_AUDIO_GLOB)
    ap.add_argument("--filecount", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--offset", type=int, default=100, help="skip training files")
    args = ap.parse_args(argv)

    from ..dsp.mel import mel_spectrogram
    from ..eval.metrics import lsd, si_snr, stoi
    from ..utils.config import MelConfig, StftConfig

    codec = load_codec(args.ckpt, args.size)
    sr = codec.cfg.sample_rate
    t = int(args.seconds * sr) // codec.cfg.chunk * codec.cfg.chunk
    wav = load_audio_batch(args.audio_glob, args.filecount, sr, t / sr, offset=args.offset)
    # operate at the codec's training loudness (speech_batches peak=0.7)
    peak = jnp.max(jnp.abs(wav), axis=-1, keepdims=True)
    wav = wav * (0.7 / jnp.maximum(peak, 1e-4))

    codes = codec.encode(wav)
    recon = codec.decode(codes)

    scfg = StftConfig(1024, 256, 1024)
    mcfg = MelConfig(sample_rate=sr, n_fft=1024, n_mels=80)
    mel_ref = mel_spectrogram(wav, scfg, mcfg)
    mel_rec = mel_spectrogram(recon, scfg, mcfg)
    mel_l1 = float(jnp.mean(jnp.abs(mel_ref - mel_rec)))

    usage = []
    for c in codes:
        u = len(np.unique(np.asarray(c))) / codec.cfg.codebook_size
        usage.append(round(u, 4))

    print({
        "mel_l1": round(mel_l1, 4),
        "si_snr_db": round(float(jnp.mean(si_snr(wav, recon))), 2),
        "lsd": round(float(jnp.mean(lsd(wav, recon))), 2),
        "stoi": round(float(jnp.mean(stoi(wav, recon, sr))), 3),
        "codebook_usage_per_level": usage,
        "recon_rms": round(float(jnp.sqrt(jnp.mean(recon**2))), 4),
        "wav_rms": round(float(jnp.sqrt(jnp.mean(wav**2))), 4),
    })


if __name__ == "__main__":
    main()
