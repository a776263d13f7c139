"""Latent-space PCA analysis + PCA-based attacks.

TPU rebuild of the reference's EnCodec-latent experiments
(``pgd_research/src/misc/``):
  * PCA trained on clean continuous latents (``experiment_b_latent_pca.py:
    100-130``, ``pgd_interpretability.py:39-66``) — here one jnp SVD over a
    batched latent matrix.
  * attack family (``attack_baselines.py:189-216``): PCA Amputation (zero
    tail components), PCA Jamming (tail <- 2 sigma noise), Latent Rounding
    (quantize at scale).
  * Exp A latent-delta metrics (``experiment_a_latent_pca.py:112-175``):
    watermark delta L2 / cosine-to-content / latent SNR, PCA cumulative
    variance of deltas.
  * Exp B reconstruction-attack sweep: keep top-K in {10..128}, decode,
    detect (``experiment_b_latent_pca.py:133-178``).
  * PGD head/tail energy decomposition (``pgd_interpretability.py:160-167``).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def fit_pca(latents: jnp.ndarray, n_components: int) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(N, D) (or (B, T, D), flattened) -> (mean (D,), components (k, D),
    explained_variance (k,))."""
    x = latents.reshape(-1, latents.shape[-1])
    mean = jnp.mean(x, axis=0)
    xc = x - mean
    _, s, vh = jnp.linalg.svd(xc, full_matrices=False)
    var = (s**2) / (x.shape[0] - 1)
    return mean, vh[:n_components], var[:n_components]


def pca_project(z: jnp.ndarray, mean: jnp.ndarray, comps: jnp.ndarray) -> jnp.ndarray:
    return (z - mean) @ comps.T


def pca_reconstruct(coeff: jnp.ndarray, mean: jnp.ndarray, comps: jnp.ndarray) -> jnp.ndarray:
    return coeff @ comps + mean


def amputation_fn(mean: jnp.ndarray, comps: jnp.ndarray, keep_k: int) -> Callable:
    """Zero every component beyond the first keep_k (PCA Amputation,
    ``attack_baselines.py:189-196``)."""

    def fn(z):
        c = pca_project(z, mean, comps)
        c = c.at[..., keep_k:].set(0.0)
        return pca_reconstruct(c, mean, comps) + (z - pca_reconstruct(pca_project(z, mean, comps), mean, comps))

    return fn


def jamming_fn(mean: jnp.ndarray, comps: jnp.ndarray, keep_k: int, key: jax.Array, scale: float = 2.0) -> Callable:
    """Replace tail coefficients with scale*sigma gaussian noise (PCA
    Jamming, ``attack_baselines.py:199-207``)."""

    def fn(z):
        c = pca_project(z, mean, comps)
        sigma = jnp.std(c, axis=tuple(range(c.ndim - 1)), keepdims=True)
        noise = jax.random.normal(key, c.shape) * sigma * scale
        mask = (jnp.arange(c.shape[-1]) >= keep_k).astype(c.dtype)
        c = c * (1 - mask) + noise * mask
        return pca_reconstruct(c, mean, comps)

    return fn


def rounding_fn(scale: float = 5.0) -> Callable:
    """Quantize latents at `scale` (Latent Rounding,
    ``attack_baselines.py:210-216``)."""

    def fn(z):
        return jnp.round(z * scale) / scale

    return fn


def latent_delta_metrics(
    z_clean: jnp.ndarray, z_marked: jnp.ndarray, n_pca: int = 10
) -> dict[str, np.ndarray]:
    """Exp A (``experiment_a_latent_pca.py:112-175``): per-clip watermark
    delta norms, cosine to content, latent SNR, and PCA cumulative variance
    of the deltas."""
    d = z_marked - z_clean  # (B, T, D)
    d_flat = d.reshape(d.shape[0], -1)
    z_flat = z_clean.reshape(z_clean.shape[0], -1)
    l2 = jnp.linalg.norm(d_flat, axis=-1)
    cos = jnp.sum(d_flat * z_flat, axis=-1) / (
        jnp.linalg.norm(d_flat, axis=-1) * jnp.linalg.norm(z_flat, axis=-1) + 1e-9
    )
    snr = 10.0 * jnp.log10(
        (jnp.sum(z_flat**2, -1) + 1e-9) / (jnp.sum(d_flat**2, -1) + 1e-9)
    )
    dm = d.reshape(-1, d.shape[-1])
    _, _, var = fit_pca(dm, min(n_pca, dm.shape[-1]))
    total_var = jnp.sum(jnp.var(dm - dm.mean(0), axis=0))
    cumvar = jnp.cumsum(var) / (total_var + 1e-12)
    return {
        "delta_l2": np.asarray(l2),
        "cos_to_content": np.asarray(cos),
        "latent_snr_db": np.asarray(snr),
        "pca_cumvar": np.asarray(cumvar),
    }


def reconstruction_attack_sweep(
    codec,
    wm,
    marked: jnp.ndarray,
    mean: jnp.ndarray,
    comps: jnp.ndarray,
    keep_ks: Sequence[int] = (10, 20, 50, 80, 100, 128),
    msg=None,
):
    """Exp B: keep top-K PCA components of watermarked latents, decode,
    re-detect.  -> DataFrame(K, score_mean, sisnr_mean)."""
    import pandas as pd

    from ..attacks.codec import latent_transform_attack
    from ..eval.metrics import si_snr

    rows = []
    for k in keep_ks:
        att = latent_transform_attack(codec, marked, amputation_fn(mean, comps, int(k)))
        score = np.asarray(wm.score(att, msg) if msg is not None else wm.score(att))
        s = np.asarray(si_snr(marked, att))
        rows.append({"keep_k": int(k), "score_mean": float(score.mean()), "sisnr_mean": float(s.mean())})
    return pd.DataFrame(rows)


def head_tail_energy(
    dz: jnp.ndarray, comps: jnp.ndarray, head_k: int = 60
) -> tuple[float, float]:
    """PGD noise energy split into protected head vs tail subspace
    (``pgd_interpretability.py:160-167``)."""
    c = dz.reshape(-1, dz.shape[-1]) @ comps.T
    head = float(jnp.sum(c[:, :head_k] ** 2))
    total = float(jnp.sum(dz**2))
    return head, max(total - head, 0.0)
