"""Shared CLI plumbing: audio loading, watermarker construction.

Mirrors the reference CLI conventions (``--datasets --watermarks
--filecount --audio_dir --out_csv``, ``watermark_testing.py:954-1021``) with
batched loading instead of per-file loops."""

from __future__ import annotations

import glob as globlib
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_AUDIO_GLOB = "/root/reference/dataset/LibriSpeech/*.wav"


def load_audio_batch(
    audio_glob: str,
    count: int,
    sr: int,
    seconds: float = 2.0,
    offset: int = 0,
) -> jnp.ndarray:
    """Load `count` clips as one (count, seconds*sr) batch: mono, resampled,
    truncated/padded (the reference's 5 s cap idiom, ``:903-907``)."""
    from ..dsp.resample import resample
    from ..utils import audio_io

    files = sorted(globlib.glob(audio_glob))[offset : offset + count]
    if not files:
        raise SystemExit(f"no audio files match {audio_glob}")
    t = int(seconds * sr)
    out = []
    for f in files:
        a, fsr = audio_io.read_wav(f)
        x = jnp.asarray(a.mean(axis=0))
        if fsr != sr:
            x = resample(x, fsr, sr)
        x = np.asarray(x)[:t]
        if len(x) < t:
            x = np.pad(x, (0, t - len(x)))
        out.append(x)
    return jnp.asarray(np.stack(out).astype(np.float32))


def load_audio_clips(
    audio_glob: str,
    count: int,
    sr: int,
    max_seconds: float,
    offset: int = 0,
) -> list[np.ndarray]:
    """Clips at their NATIVE length (capped at `max_seconds`), resampled,
    mono — for the robustness runner, whose per-chunk schema must not
    contain fabricated silence: `load_audio_batch` zero-pads every clip to
    the cap, and 63/124 LibriSpeech clips are shorter than the 8 s
    robustness crop, so 139/496 of the 2-s chunks were pure padding
    (bitwise/clean decayed 0.99 -> 0.80 with chunk index; round-5 finding).
    raw_bench reads real files at real lengths — so do we."""
    from ..dsp.resample import resample
    from ..utils import audio_io

    files = sorted(globlib.glob(audio_glob))[offset : offset + count]
    if not files:
        raise SystemExit(f"no audio files match {audio_glob}")
    cap = int(max_seconds * sr)
    out = []
    for f in files:
        a, fsr = audio_io.read_wav(f)
        x = jnp.asarray(a.mean(axis=0))
        if fsr != sr:
            x = resample(x, fsr, sr)
        out.append(np.asarray(x, np.float32)[:cap])
    return out


def load_codec(ckpt: str | None, size: str = "full"):
    """Build a CodecState, restoring weights from `ckpt` when given."""
    from ..codec import make_codec
    from ..utils.checkpoint import load_params
    from ..utils.config import CodecConfig

    cfg = CodecConfig() if size == "full" else CodecConfig(
        encoder_dim=8, latent_dim=64, decoder_dim=64, codebook_size=128, codebook_dim=8
    )
    codec = make_codec(jax.random.PRNGKey(0), cfg)
    if ckpt and Path(ckpt).exists():
        import dataclasses

        params = load_params(ckpt, codec.params)
        codec = dataclasses.replace(codec, params=params)
        print(f"[codec] restored weights from {ckpt}")
    else:
        print(f"[codec] WARNING: no checkpoint at {ckpt!r}; using RANDOM weights "
              "(codec round-trips will destroy audio; train with cli.train_codec)")
    return codec


def preflight_probe(
    watermarks: list[str],
    codec_ckpt: str | None = None,
    codec_size: str = "full",
    sample_rate: int = 16_000,
    timeout_s: float = 900.0,
) -> None:
    """Run ``cli.probe`` for each requested watermark in a disposable
    subprocess before a full-scale stage.  A watermark whose probe hangs or
    dies aborts the run BEFORE the full-scale dispatch that would take the
    TPU worker down with it (VERDICT r3 #8; crash record in CLAUDE.md).
    Timeout default is generous because a cold remote compile takes
    minutes."""
    import subprocess
    import sys

    for name in watermarks:
        cmd = [
            sys.executable, "-m", "nawc_tpu.cli.probe", "--watermark", name,
            "--sample_rate", str(sample_rate), "--codec_size", codec_size,
        ]
        if codec_ckpt:
            cmd += ["--codec_ckpt", codec_ckpt]
        print(f"[probe] preflight {name} (subprocess, timeout {timeout_s:.0f}s)",
              flush=True)
        try:
            proc = subprocess.run(cmd, timeout=timeout_s, capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            raise SystemExit(
                f"[probe] {name} preflight TIMED OUT after {timeout_s:.0f}s — "
                "refusing to run the full-scale stage (TPU worker may be down "
                "or this path hangs; see CLAUDE.md crash record)")
        if proc.returncode != 0:
            tail = (proc.stderr or proc.stdout or "").strip().splitlines()[-8:]
            raise SystemExit(
                f"[probe] {name} preflight FAILED (rc={proc.returncode}) — "
                "refusing to run the full-scale stage.\n" + "\n".join(tail))
        lines = proc.stdout.strip().splitlines()
        print(f"[probe] {lines[-1] if lines else f'{name} preflight ok (no output)'}",
              flush=True)


WM_CHOICES = (
    "spread_spectrum", "chunked", "psychoacoustic",
    "semantic_pca", "semantic_cluster", "semantic_random",
    "token_green", "neural",
)


def build_watermarkers(names: list[str], codec=None, sample_rate: int | None = None) -> dict[str, object]:
    """Name -> watermarker instances; semantic ones need a codec."""
    from ..models import SemanticWM, SpreadSpectrumWM, ChunkedWM, PsychoacousticWM
    from ..utils.config import SpreadSpectrumConfig

    out: dict[str, object] = {}
    for n in names:
        if n == "spread_spectrum":
            cfg = SpreadSpectrumConfig(alpha=0.1) if sample_rate is None else SpreadSpectrumConfig(
                sample_rate=sample_rate, band_hi_hz=min(0.45 * sample_rate, 9000.0), alpha=0.1
            )
            out[n] = SpreadSpectrumWM(cfg=cfg)
        elif n == "chunked":
            out[n] = ChunkedWM()
        elif n == "psychoacoustic":
            out[n] = PsychoacousticWM()
        elif n == "token_green":
            if codec is None:
                raise SystemExit(f"{n} requires a codec")
            from ..models import TokenGreenWM

            out[n] = TokenGreenWM(codec)
        elif n == "neural":
            import dataclasses as _dc

            import jax as _jax

            from ..models import init_neural_wm
            from ..utils.checkpoint import load_params as _load

            wm = init_neural_wm(_jax.random.PRNGKey(0))
            ckpt = Path("checkpoints/neural_wm.msgpack")
            if ckpt.exists():
                blob = _load(ckpt, {"gen": wm.gen_params, "det": wm.det_params})
                wm = _dc.replace(wm, gen_params=blob["gen"], det_params=blob["det"])
                print(f"[neural] restored weights from {ckpt}")
            else:
                print("[neural] WARNING: no checkpoint; random weights (train with cli.train_wm)")
            out[n] = wm
        elif n.startswith("semantic_"):
            if codec is None:
                raise SystemExit(f"{n} requires --codec_ckpt / codec")
            kind = {"semantic_pca": "pca", "semantic_cluster": "kmeans", "semantic_random": "random"}[n]
            out[n] = SemanticWM(codec, kind)
        else:
            raise SystemExit(f"unknown watermark {n!r}; choices: {WM_CHOICES}")
    return out
