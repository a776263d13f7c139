"""raw_bench-style robustness runner: per-chunk results with the reference
CSV schema, removing the external raw_bench dependency.

The reference consumes pipe-delimited per-chunk ``test_results_*.csv`` files
produced by the external raw_bench package, with columns chunk_index,
attack_type, bitwise/{clean,distorted,no_watermark_clean,no_watermark_
distorted}, hard/{...}, sisnr_wm, sisnr_attack (schema visible in
``interpretability_research/outputs/*/overall_stats.csv`` headers and
aggregation code ``compute_watermark_stats.py:42-111``).  This module
produces the same rows natively: audio is chunked (chunk = batch dim, not a
Python loop), each chunk is embedded, attacked, and detected, and the
"no_watermark" control columns come from running the detector on clean
chunks.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models.base import random_message
from .metrics import si_snr


def chunk_audio(wav: np.ndarray, sr: int, chunk_seconds: float = 2.0) -> tuple[np.ndarray, np.ndarray]:
    """(T,) -> ((n_chunks, chunk_len), chunk_index array)."""
    c = int(chunk_seconds * sr)
    n = max(len(wav) // c, 1)
    if len(wav) < c:
        wav = np.pad(wav, (0, c - len(wav)))
    chunks = wav[: n * c].reshape(n, c)
    return chunks, np.arange(n)


def run_robustness(
    wm,
    attacks: dict[str, Callable],
    clips: list[np.ndarray],
    sr: int,
    chunk_seconds: float = 2.0,
    hard_threshold: float = 0.5,
    seed: int = 0,
    sync: bool = False,
    detect_batch: int | None = None,
):
    """-> pandas DataFrame with the raw_bench per-chunk schema.

    bitwise/* = bit accuracy vs the embedded payload (0.5-ish when absent);
    hard/* = presence decision at `hard_threshold`; sisnr_wm = SI-SNR of the
    watermarked vs clean chunk; sisnr_attack = SI-SNR of attacked vs
    watermarked."""
    import pandas as pd

    key = jax.random.PRNGKey(seed)
    # stack all chunks of all clips into one batch
    all_chunks, idx_rows = [], []
    for ci, clip in enumerate(clips):
        chunks, idx = chunk_audio(np.asarray(clip), sr, chunk_seconds)
        all_chunks.append(chunks)
        for j in idx:
            idx_rows.append((ci, int(j)))
    batch = jnp.asarray(np.concatenate(all_chunks).astype(np.float32))
    b = batch.shape[0]

    has_bits = getattr(wm, "n_bits", 0) > 0
    msg = random_message(key, b, wm.n_bits) if has_bits else None
    marked = wm.embed(batch, msg, key) if has_bits else wm.embed(batch)
    sisnr_wm = np.asarray(si_snr(batch, marked))

    def detect_all(wav):
        """Detect in host-side sub-batches: the neural detect_sync stage-2
        double pass on a ~400-chunk batch exceeds HBM (conv activations are
        ~(B*nc, 16000, 32) f32 per layer); slicing the batch keeps peak
        memory flat at identical results."""
        db = detect_batch or wav.shape[0]
        ps, bs = [], []
        for i in range(0, wav.shape[0], db):
            w = wav[i : i + db]
            if sync and hasattr(wm, "detect_sync"):
                presence, bits, _ = wm.detect_sync(w)
            else:
                presence, bits = wm.detect(w)
            ps.append(np.asarray(presence))
            bs.append(np.asarray(bits))
        return np.concatenate(ps), np.concatenate(bs)

    def stats(wav):
        presence, bits = detect_all(wav)
        if has_bits:
            bitacc = np.asarray((bits == np.asarray(msg)).astype(np.float32).mean(axis=-1))
        else:
            score = np.asarray(wm.score(wav))
            bitacc = score  # semantic methods report raw score in this slot
        return bitacc, (presence > hard_threshold).astype(np.float32)

    bit_clean, hard_clean = stats(marked)
    bit_nw_clean, hard_nw_clean = stats(batch)

    rows = []
    for aname, attack in attacks.items():
        attacked = attack(marked, key)
        attacked_nw = attack(batch, key)
        bit_dist, hard_dist = stats(attacked)
        bit_nw_dist, hard_nw_dist = stats(attacked_nw)
        sisnr_att = np.asarray(si_snr(marked, attacked))
        for i, (ci, j) in enumerate(idx_rows):
            rows.append({
                "clip_index": ci,
                "chunk_index": j,
                "attack_type": aname,
                "bitwise/clean": float(bit_clean[i]),
                "bitwise/distorted": float(bit_dist[i]),
                "bitwise/no_watermark_clean": float(bit_nw_clean[i]),
                "bitwise/no_watermark_distorted": float(bit_nw_dist[i]),
                "hard/clean": float(hard_clean[i]),
                "hard/distorted": float(hard_dist[i]),
                "hard/no_watermark_clean": float(hard_nw_clean[i]),
                "hard/no_watermark_distorted": float(hard_nw_dist[i]),
                "sisnr_wm": float(sisnr_wm[i]),
                "sisnr_attack": float(sisnr_att[i]),
            })
    return pd.DataFrame(rows)


def write_results_csv(df, path: str) -> None:
    """Pipe-delimited, like raw_bench's test_results_*.csv
    (``compute_watermark_stats.py`` reads sep='|')."""
    df.to_csv(path, sep="|", index=False)


def overall_stats(df):
    """Reference overall_stats.csv schema (mean/std of every numeric col +
    n), via interp.agg_stats on a single group."""
    from ..interp.feature_importance import agg_stats

    tmp = df.copy()
    tmp["_all"] = 0
    out = agg_stats(tmp.drop(columns=["attack_type"], errors="ignore"), ["_all"])
    return out.drop(columns=["_all"])


def stats_by_attack(df):
    """Reference stats_by_attack.csv schema."""
    from ..interp.feature_importance import agg_stats

    return agg_stats(df, ["attack_type"])
