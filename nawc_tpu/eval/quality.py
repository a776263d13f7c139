"""Quality evaluation of clean/watermarked pairs: the reference's
``audio_quality_check/evaluate_quality.py`` pipeline (CSV of pairs in ->
``*_quality_results.csv`` out) with metrics computed batched on-device."""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..dsp.resample import resample
from ..utils import audio_io
from .metrics import lsd, pesq_host, si_snr, snr, stoi


def evaluate_pair_batch(clean: jnp.ndarray, marked: jnp.ndarray, sr: int) -> dict[str, np.ndarray]:
    """(B, T) x2 -> metric columns (named like evaluate_quality.py:54-78)."""
    si_c = np.asarray(si_snr(clean, clean))
    si_w = np.asarray(si_snr(clean, marked))
    return {
        "si_snr_clean": si_c,
        "si_snr_watermarked": si_w,
        "delta_si_snr": si_w - si_c,
        "snr": np.asarray(snr(clean, marked)),
        "lsd": np.asarray(lsd(clean, marked)),
        "stoi": np.asarray(stoi(clean, marked, sr)),
    }


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
    cols = evaluate_pair_batch(cleans, markeds, sr)
    rows = []
    for i, (cp, mp) in enumerate(pairs):
        row = {"clean": cp, "watermarked": mp, "attack": "", "instrument": "speech"}
        row.update({k: float(v[i]) for k, v in cols.items()})
        if with_pesq:
            row["pesq"] = pesq_host(np.asarray(cleans[i]), np.asarray(markeds[i]), sr)
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
