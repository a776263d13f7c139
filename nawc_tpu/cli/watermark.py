"""File-level watermarking tool: embed/detect on WAV files.

Usage:
  python -m nawc_tpu.cli.watermark embed --input x.wav --output y.wav \
      --method spread_spectrum --message 0xBEEF
  python -m nawc_tpu.cli.watermark detect --input y.wav --method spread_spectrum [--sync]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def _msg_bits(message: str, n_bits: int) -> np.ndarray:
    """Hex (0x...) or binary string -> (1, n_bits) bit array."""
    if message.startswith(("0x", "0X")):
        val = int(message, 16)
        bits = [(val >> (n_bits - 1 - i)) & 1 for i in range(n_bits)]
    else:
        if len(message) != n_bits or set(message) - {"0", "1"}:
            raise SystemExit(f"--message must be 0x hex or {n_bits} binary digits")
        bits = [int(c) for c in message]
    return np.asarray([bits], np.int32)


def _bits_msg(bits: np.ndarray) -> str:
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return hex(val)


def main(argv=None) -> None:
    from .common import WM_CHOICES, build_watermarkers, load_codec

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("command", choices=["embed", "detect"])
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", default=None)
    ap.add_argument("--method", default="spread_spectrum", choices=WM_CHOICES)
    ap.add_argument("--message", default=None, help="payload: 0xHEX or bit string")
    ap.add_argument("--sync", action="store_true", help="shift-robust detection")
    ap.add_argument("--codec_ckpt", default="checkpoints/codec_24k.msgpack")
    ap.add_argument("--codec_size", choices=["full", "small"], default="full")
    args = ap.parse_args(argv)

    from ..dsp.resample import resample
    from ..utils import audio_io
    from ..utils.padding import pad_to_multiple

    needs_codec = args.method.startswith("semantic") or args.method == "token_green"
    codec = load_codec(args.codec_ckpt, args.codec_size) if needs_codec else None
    wm = build_watermarkers([args.method], codec)[args.method]

    audio, sr = audio_io.read_wav(args.input)
    x = jnp.asarray(audio.mean(axis=0))
    if sr != wm.sample_rate:
        x = resample(x, sr, wm.sample_rate)
    t = x.shape[-1]
    x = pad_to_multiple(x[None], 4096)

    if args.command == "embed":
        if wm.n_bits:
            msg = jnp.asarray(
                _msg_bits(args.message, wm.n_bits) if args.message
                else np.asarray(jax.random.bernoulli(jax.random.PRNGKey(0), 0.5, (1, wm.n_bits)), np.int32)
            )
            marked = wm.embed(x, msg, jax.random.PRNGKey(0))
            payload = _bits_msg(np.asarray(msg)[0])
        else:
            marked = wm.embed(x)
            payload = "(presence-only)"
        y = np.asarray(marked[0, :t])
        if sr != wm.sample_rate:
            y = np.asarray(resample(jnp.asarray(y), wm.sample_rate, sr))
        out = args.output or args.input.replace(".wav", ".marked.wav")
        audio_io.write_wav(out, y, sr)
        print(json.dumps({"written": out, "payload": payload,
                          "method": args.method, "sample_rate": sr}))
    else:
        if args.sync and hasattr(wm, "detect_sync"):
            presence, bits, lag = wm.detect_sync(x)
            extra = {"lag_frames": int(np.asarray(lag)[0])}
        else:
            presence, bits = wm.detect(x)
            extra = {}
        out = {
            "method": args.method,
            "presence": round(float(np.asarray(presence)[0]), 4),
            "detected": bool(np.asarray(presence)[0] > 0.5),
            **extra,
        }
        if wm.n_bits:
            out["payload"] = _bits_msg(np.asarray(bits)[0])
        print(json.dumps(out))


if __name__ == "__main__":
    main()
