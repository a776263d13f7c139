"""Codebook-layer ablation sweeps.

TPU rebuild of ``run_snac_layer_ablation`` (``interpretability_research/
scripts/run_snac_layer_ablation.py:167-235``): for every mask in the
full_all / drop_last_k / keep_only_i families, decode the masked codes and
re-detect every watermark — here one batched detect per (mask, watermarker)
instead of per-file loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..attacks.codec import ablation_masks, layer_ablation
from ..codec.api import CodecState


def run_layer_ablation(
    codec: CodecState,
    watermarkers: dict[str, object],
    clean: jnp.ndarray,
    in_sr: int | None = None,
):
    """-> pandas DataFrame with columns (mask, watermark, clip, score,
    score_clean_recon) matching the reference CSV semantics."""
    import pandas as pd

    masks = ablation_masks(codec.cfg.num_levels)
    rows = []
    key = jax.random.PRNGKey(0)
    for wname, wm in watermarkers.items():
        if getattr(wm, "n_bits", 0) > 0:
            from ..models.base import random_message

            msg = random_message(key, clean.shape[0], wm.n_bits)
            marked = wm.embed(clean, msg, key)
        else:
            msg = None
            marked = wm.embed(clean)
        for mname, mask in masks.items():
            recon = layer_ablation(codec, marked, mask, in_sr=in_sr)
            score = np.asarray(wm.score(recon, msg) if msg is not None else wm.score(recon))
            for i in range(clean.shape[0]):
                rows.append(
                    {"mask": mname, "watermark": wname, "clip": i, "score": float(score[i])}
                )
    return pd.DataFrame(rows)


def ablation_heatmap(df) -> "np.ndarray":
    """Pivot (mask x watermark) mean scores (plot helper for the reference's
    heatmap, ``run_snac_layer_ablation_plot.py:62-95``)."""
    return df.pivot_table(index="mask", columns="watermark", values="score", aggfunc="mean")
