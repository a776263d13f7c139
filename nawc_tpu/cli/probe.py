"""Tiny-scale end-to-end probe: embed + detect for one watermark at
n=2 x 1 s clips, printing one OK line.

Run in a DISPOSABLE SUBPROCESS before a full-scale TPU stage (the
CLAUDE.md disposable-probe rule, automated): the semantic fly-embed has
kernel-faulted the axon TPU worker at production scale (~15 min outage,
every TPU process hangs), so any stage that would pay that cost first
checks that the same code path completes at a scale that cannot hurt.

Usage:
  python -m nawc_tpu.cli.probe --watermark semantic_cluster
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    from .common import (
        DEFAULT_AUDIO_GLOB,
        WM_CHOICES,
        build_watermarkers,
        load_audio_batch,
        load_codec,
    )

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--watermark", required=True, choices=WM_CHOICES)
    ap.add_argument("--audio_glob", default=DEFAULT_AUDIO_GLOB)
    ap.add_argument("--filecount", type=int, default=2)
    ap.add_argument("--seconds", type=float, default=1.0)
    ap.add_argument("--sample_rate", type=int, default=16_000)
    ap.add_argument("--codec_ckpt", default="checkpoints/codec_24k.msgpack")
    ap.add_argument("--codec_size", choices=["full", "small"], default="full")
    args = ap.parse_args(argv)

    import jax
    import numpy as np

    needs_codec = args.watermark.startswith("semantic") or args.watermark == "token_green"
    codec = load_codec(args.codec_ckpt, args.codec_size) if needs_codec else None
    wm = build_watermarkers(
        [args.watermark], codec,
        sample_rate=None if args.sample_rate == 16_000 else args.sample_rate,
    )[args.watermark]
    wav = load_audio_batch(args.audio_glob, args.filecount, wm.sample_rate, args.seconds)
    key = jax.random.PRNGKey(0)
    if getattr(wm, "n_bits", 0) > 0:
        from ..models.base import random_message

        msg = random_message(key, wav.shape[0], wm.n_bits)
        marked = wm.embed(wav, msg, key)
    else:
        marked = wm.embed(wav)
    presence, _bits = wm.detect(marked)
    presence = np.asarray(presence)
    assert np.isfinite(presence).all(), presence
    print(f"probe ok {args.watermark} n={wav.shape[0]} "
          f"presence={np.round(presence.mean(), 4)}", flush=True)


if __name__ == "__main__":
    main()
