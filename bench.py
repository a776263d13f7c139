"""Throughput benchmark: encode + watermark + detect at 24 kHz on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 500 (the BASELINE.json north-star target of >=500x
real-time per TPU chip at 24 kHz).

The measured pipeline is the fused flagship graph: spread-spectrum embed
(stft -> modulate -> istft x2) + full-size SNAC-style codec encode (conv
stack + 3-level RVQ with the Pallas codebook lookup) + watermark detect
(stft -> whiten -> correlate), all in one jit.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from nawc_tpu.codec import make_codec
    from nawc_tpu.models import SpreadSpectrumWM
    from nawc_tpu.utils.config import CodecConfig, SpreadSpectrumConfig

    cfg = CodecConfig()  # full-size 24 kHz codec
    sr = cfg.sample_rate
    codec = make_codec(jax.random.PRNGKey(0), cfg)
    wm = SpreadSpectrumWM(
        cfg=SpreadSpectrumConfig(sample_rate=sr, band_hi_hz=9000.0, alpha=0.1)
    )

    batch, seconds = 16, 4
    t = sr * seconds
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(size=(batch, t)).astype(np.float32) * 0.1)
    msg = jnp.asarray(rng.integers(0, 2, (batch, wm.n_bits)), jnp.int32)

    # three per-stage jitted graphs (compiling one fused mega-graph through
    # the remote-compile tunnel takes far longer than it saves; each stage
    # is already a single XLA program and dispatch is ~1 ms)
    def pipeline(wav, msg):
        marked = wm.embed(wav, msg)
        codes = codec.encode(marked)
        presence, bits = wm.detect(marked)
        return codes[0], presence, bits

    # warmup / compile
    out = pipeline(wav, msg)
    jax.block_until_ready(out)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipeline(wav, msg)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    audio_seconds = batch * seconds
    xrt = audio_seconds / dt
    print(
        json.dumps(
            {
                "metric": "xrt_encode_watermark_detect_24khz",
                "value": round(xrt, 2),
                "unit": "x_realtime_per_chip",
                "vs_baseline": round(xrt / 500.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
