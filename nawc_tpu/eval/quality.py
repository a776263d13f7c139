"""Quality evaluation of clean/watermarked pairs: the reference's
``audio_quality_check/evaluate_quality.py`` pipeline (CSV of pairs in ->
``*_quality_results.csv`` out) with metrics computed batched on-device."""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..dsp.resample import resample
from ..utils import audio_io
from ..utils.config import StftConfig
from .metrics import lsd, pesq_host, si_snr, snr, stoi

# The reference computes EVERY quality metric at 16 kHz regardless of the
# method's native rate (``evaluate_quality.py:20-27`` load_audio resamples
# both files), with LSD over an n_fft=1024 / hop=512 magnitude STFT and
# eps=1e-8 (``:45-52``).  Published BASELINE §6.1 numbers are only
# comparable under this protocol — e.g. a 24 kHz codec-resynthesis
# watermark's >8 kHz noise floor is outside the measurement band.  Both
# signals go through the SAME linear resample, so the comparison measures
# resample(marked - clean) and introduces no resampling artifacts of its
# own.
REF_EVAL_SR = 16_000
_REF_LSD_CFG = StftConfig(1024, 512, 1024)


def evaluate_pair_batch(
    clean: jnp.ndarray, marked: jnp.ndarray, sr: int, with_pesq: bool = False
) -> dict[str, np.ndarray]:
    """(B, T) x2 at the embed rate ``sr`` -> metric columns (named like
    evaluate_quality.py:54-78), measured under the reference protocol.

    ``stoi`` is the exact (pystoi-algorithm) host implementation so the
    column is comparable against the reference's pystoi numbers; the fast
    on-device approximation is reported alongside as ``stoi_dev``.
    ``lsd_native`` is the LSD at the embed's NATIVE sample rate (ADVICE r4:
    the 16 kHz protocol cannot see a 24 kHz method's 8-12 kHz band, so the
    protocol number alone can understate audible distortion)."""
    from .stoi_exact import stoi_exact_batch

    lsd_native = np.asarray(lsd(clean, marked, _REF_LSD_CFG))
    if sr != REF_EVAL_SR:
        clean = resample(clean, sr, REF_EVAL_SR)
        marked = resample(marked, sr, REF_EVAL_SR)
    si_c = np.asarray(si_snr(clean, clean))
    si_w = np.asarray(si_snr(clean, marked))
    cols = {
        "si_snr_clean": si_c,
        "si_snr_watermarked": si_w,
        "delta_si_snr": si_w - si_c,
        "snr": np.asarray(snr(clean, marked)),
        "lsd": np.asarray(lsd(clean, marked, _REF_LSD_CFG)),
        "stoi": stoi_exact_batch(np.asarray(clean), np.asarray(marked), REF_EVAL_SR),
        "stoi_dev": np.asarray(stoi(clean, marked, REF_EVAL_SR)),
        "lsd_native": lsd_native,
    }
    if with_pesq:
        cols["pesq"] = np.asarray([
            pesq_host(np.asarray(clean[i]), np.asarray(marked[i]), REF_EVAL_SR)
            for i in range(clean.shape[0])
        ])
    return cols


def evaluate_pairs(pairs: list[tuple[str, str]], sr: int = 16_000, with_pesq: bool = True):
    """pairs = [(clean_path, marked_path)] -> DataFrame with the reference
    quality-results schema (``evaluate_quality.py:80-115``)."""
    import pandas as pd

    cleans, markeds = [], []
    t_min = None
    for cp, mp in pairs:
        c, csr = audio_io.read_wav(cp)
        m, msr = audio_io.read_wav(mp)
        c = jnp.asarray(c.mean(axis=0))
        m = jnp.asarray(m.mean(axis=0))
        if csr != sr:
            c = resample(c, csr, sr)
        if msr != sr:
            m = resample(m, msr, sr)
        t = min(c.shape[-1], m.shape[-1])
        t_min = t if t_min is None else min(t_min, t)
        cleans.append(c[:t])
        markeds.append(m[:t])
    cleans = jnp.stack([c[:t_min] for c in cleans])
    markeds = jnp.stack([m[:t_min] for m in markeds])
    cols = evaluate_pair_batch(cleans, markeds, sr, with_pesq=with_pesq)
    rows = []
    for i, (cp, mp) in enumerate(pairs):
        row = {"clean": cp, "watermarked": mp, "attack": "", "instrument": "speech"}
        row.update({k: float(v[i]) for k, v in cols.items()})
        rows.append(row)
    return pd.DataFrame(rows)


def make_pairs(results_dir: str | Path) -> list[tuple[str, str]]:
    """Walk a results tree pairing 1_original.wav / 2_watermarked.wav
    (``audio_quality_check/make_pairs.py:4-38``)."""
    out = []
    for orig in sorted(Path(results_dir).rglob("1_original.wav")):
        marked = orig.parent / "2_watermarked.wav"
        if marked.exists():
            out.append((str(orig), str(marked)))
    return out
