"""White-box PGD attacks against differentiable detector scores.

Rebuilds the reference's PGD research (100-step sign-PGD vs the AudioSeal
detector, ``pgd_research/src/misc/attack_test.py:63-126`` and
``pgd_interpretability.py:98-171``) and the PCA-subspace-constrained variant
(project the adversarial noise into the null space of the top-K "content"
components every few steps, ``experiment_c_attack_comparison.py:121-180,
241-244``) as jitted ``lax.fori_loop`` loops batched over clips — the
reference runs one file at a time in Python.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

ScoreFn = Callable[[jnp.ndarray], jnp.ndarray]  # (B, T) -> (B,) score


@functools.partial(
    jax.jit, static_argnames=("score_fn", "steps", "sign_update")
)
def pgd_attack(
    score_fn: ScoreFn,
    wav: jnp.ndarray,
    steps: int = 100,
    eps: float = 0.02,
    lr: float = 0.001,
    sign_update: bool = True,
) -> jnp.ndarray:
    """Minimize `score_fn` over an additive perturbation with ||delta||_inf
    <= eps (PGD config of ``attack_test.py:10-19``).  Returns attacked wav."""

    grad_fn = jax.grad(lambda d: jnp.sum(score_fn(wav + d)))

    def body(_, delta):
        g = grad_fn(delta)
        step = jnp.sign(g) if sign_update else g / (jnp.abs(g).max() + 1e-9)
        delta = delta - lr * step
        return jnp.clip(delta, -eps, eps)

    delta = jax.lax.fori_loop(0, steps, body, jnp.zeros_like(wav))
    return jnp.clip(wav + delta, -1.0, 1.0)


def project_to_nullspace(
    delta_latent: jnp.ndarray, basis: jnp.ndarray
) -> jnp.ndarray:
    """Remove the component of `delta_latent` (..., D) lying in the span of
    `basis` (K, D) — protect the top-K "content" subspace
    (``experiment_c_attack_comparison.py:121-180``)."""
    coeff = delta_latent @ basis.T  # (..., K)
    return delta_latent - coeff @ basis


@functools.partial(
    jax.jit,
    static_argnames=("score_fn", "latent_fn", "steps", "project_every"),
)
def subspace_pgd_attack(
    score_fn: ScoreFn,
    latent_fn: Callable[[jnp.ndarray], jnp.ndarray],
    wav: jnp.ndarray,
    basis: jnp.ndarray,
    steps: int = 100,
    eps: float = 0.02,
    lr: float = 0.001,
    project_every: int = 5,
    protect_weight: float = 1.0,
) -> jnp.ndarray:
    """PGD that periodically discourages perturbation energy inside the
    protected latent subspace: every `project_every` steps the loss adds
    `protect_weight * ||P_head(latent(wav+d) - latent(wav))||^2`.

    This is the TPU-native form of the reference's periodic noise projection
    (``experiment_c_attack_comparison.py:241-244``): instead of decoding,
    projecting and re-encoding (non-invertible through the codec), the
    subspace constraint enters the objective directly.
    """

    z0 = jax.lax.stop_gradient(latent_fn(wav))

    def total_loss(d, use_penalty):
        loss = jnp.sum(score_fn(wav + d))
        dz = latent_fn(wav + d) - z0
        head = dz @ basis.T  # (..., K) protected-subspace coefficients
        pen = jnp.sum(head * head)
        return loss + use_penalty * protect_weight * pen

    grad_fn = jax.grad(total_loss, argnums=0)

    def body(i, delta):
        use_pen = jnp.where((i % project_every) == 0, 1.0, 0.0)
        g = grad_fn(delta, use_pen)
        delta = delta - lr * jnp.sign(g)
        return jnp.clip(delta, -eps, eps)

    delta = jax.lax.fori_loop(0, steps, body, jnp.zeros_like(wav))
    return jnp.clip(wav + delta, -1.0, 1.0)
