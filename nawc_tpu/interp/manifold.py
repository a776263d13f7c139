"""Manifold analysis: data-driven axis estimation + clean/wm/attacked
projection trajectories.

TPU-native rebuild of the reference's unified manifold pipeline
(``interpretability_research/scripts/run_manifold_analysis_all.py``):
  * ``estimate_axis`` = PCA over per-clip latent deltas
    mean_z(wm) - mean_z(clean) (``estimate_axis_for_wm``, ``:109-200``) —
    here one batched embed + one SVD instead of a per-file Python loop.
  * ``trajectory_stats`` = per-clip projection statistics for the
    clean/watermarked/attacked triplet (``:375-490``), returning the same
    stat columns (mean/std/min/max x3 + deltas) as the reference CSV.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..codec.api import CodecState
from .probe import get_latent, get_mean_latent


def estimate_axis(
    codec: CodecState, clean: jnp.ndarray, watermarked: jnp.ndarray
) -> jnp.ndarray:
    """Leading PCA direction of per-clip latent deltas (wm - clean).

    (B, T) x2 -> (D,) unit axis.  Non-finite deltas are filtered like the
    reference (``run_manifold_analysis_all.py:163-184``)."""
    d = get_mean_latent(codec, watermarked) - get_mean_latent(codec, clean)
    d = np.asarray(d)
    d = d[np.isfinite(d).all(axis=-1)]
    d = d - d.mean(axis=0, keepdims=True)
    _, _, vh = np.linalg.svd(d, full_matrices=False)
    axis = vh[0]
    return jnp.asarray(axis / (np.linalg.norm(axis) + 1e-9))


def projection_stats(proj: jnp.ndarray, prefix: str) -> dict[str, np.ndarray]:
    """(B, T') projections -> per-clip stat columns (reference rows at
    ``run_manifold_analysis_all.py:444-477``)."""
    p = np.asarray(proj)
    return {
        f"{prefix}_proj_mean": p.mean(axis=-1),
        f"{prefix}_proj_std": p.std(axis=-1),
        f"{prefix}_proj_min": p.min(axis=-1),
        f"{prefix}_proj_max": p.max(axis=-1),
    }


def trajectory_stats(
    codec: CodecState,
    axis: jnp.ndarray,
    clean: jnp.ndarray,
    watermarked: jnp.ndarray,
    attacked: jnp.ndarray,
    project=None,
    return_projs: bool = False,
):
    """Projection trajectories of the clean/wm/attacked triplet onto `axis`
    + the derived delta columns (``run_manifold_analysis_all.py:499-503``).

    `project` overrides the projection (wav -> (B, T') trajectories) — the
    semantic watermarks project in their own 8-dim codebook space
    (``project_semantic_with_wm``, ``:232-251``) rather than raw latents.
    With `return_projs`, also returns the {clean,wm,att} -> (B, T')
    trajectory dict (for the per-file triplet plots, ``:204-230``)."""
    out: dict[str, np.ndarray] = {}
    projs = {}
    proj_fn = project or (lambda wav: get_latent(codec, wav) @ axis)
    for prefix, wav in (("clean", clean), ("wm", watermarked), ("att", attacked)):
        proj = proj_fn(wav)
        projs[prefix] = np.asarray(proj)
        out.update(projection_stats(proj, prefix))
    out["delta_wm"] = out["wm_proj_mean"] - out["clean_proj_mean"]
    out["delta_att"] = out["att_proj_mean"] - out["wm_proj_mean"]
    return (out, projs) if return_projs else out


def run_manifold_analysis(
    codec: CodecState,
    watermarkers: dict[str, object],
    clean: jnp.ndarray,
    attack_fn: Callable[[jnp.ndarray], jnp.ndarray],
    embed_kwargs: dict | None = None,
    triplet_dir=None,
):
    """Full per-watermarker manifold table (pandas DataFrame).

    For semantic watermarkers the projection axis is their own manifold axis
    (``project_semantic_with_wm``, ``:232-251``); for others it is estimated
    from latent deltas (phase 1, ``:358-371``).  With `triplet_dir`, renders
    the per-file clean/wm/attacked projection plot for every clip
    (``:479-490``) under ``<triplet_dir>/<wm>/``."""
    import pandas as pd

    rows = []
    for name, wm in watermarkers.items():
        import jax

        key = jax.random.PRNGKey(0)
        if getattr(wm, "n_bits", 0) > 0:
            from ..models.base import random_message

            msg = random_message(key, clean.shape[0], wm.n_bits)
            marked = wm.embed(clean, msg, key)
        else:
            marked = wm.embed(clean)
        attacked = attack_fn(marked)
        if hasattr(wm, "projections"):  # semantic: own axis + projected space
            axis = wm.axis
            stats, projs = trajectory_stats(
                codec, axis, clean, marked, attacked, project=wm.projections, return_projs=True
            )
        else:  # non-semantic: data-driven latent-delta axis
            axis = estimate_axis(codec, clean, marked)
            stats, projs = trajectory_stats(codec, axis, clean, marked, attacked, return_projs=True)
        if triplet_dir is not None:
            from pathlib import Path

            from ..eval.figures import plot_proj_triplet

            for i in range(clean.shape[0]):
                plot_proj_triplet(
                    Path(triplet_dir) / name / f"clip_{i}_proj_{name}.png",
                    projs["clean"][i], projs["wm"][i], projs["att"][i], name,
                )
        scores = {
            "score_clean": np.asarray(wm.score(clean)),
            "score_wm": np.asarray(wm.score(marked)),
            "score_att": np.asarray(wm.score(attacked)),
        }
        for i in range(clean.shape[0]):
            row = {"watermark": name, "clip": i}
            row.update({k: float(v[i]) for k, v in stats.items()})
            row.update({k: float(v[i]) for k, v in scores.items()})
            rows.append(row)
    return pd.DataFrame(rows)
