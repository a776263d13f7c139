"""Semantic manifold watermarks: embed by gradient-optimizing a waveform
perturbation so codec-encoder latents project positively onto a 1-D
"manifold axis" derived from the RVQ codebook.

Reference behavior being reproduced TPU-natively
(``watermark_research/src/watermark_testing.py``):
  * axis kinds: PCA = 1st right singular vector of the mean-centered
    level-0 codebook (``:263-265``); k-means = unit vector between two
    Lloyd centroids, 10 iterations, seed 42 (``:397-454``); random = fixed
    seed-42 unit vector in codebook dim (``:588-597``).
  * embed = 150 Adam steps at lr 5e-3 on a waveform delta, silence-masked,
    hinge loss relu(target - proj).mean(), eps-clamped; eps static 5e-3
    (PCA, ``:292-296``) or dynamic from a 42 dB target SDR:
    eps = rms * 10^(-sdr/20) * 2 clamped to [1e-4, 0.1] (``:481-484``).
  * detect = mean latent projection, raw score (``:337-351``).
  * early stop at loss < 1e-4 (``:320``) -> per-clip update gating here
    (JAX can't data-dependently break out of a batched loop).

Differences by design: batched over clips in ONE jitted fori_loop (the
reference optimizes one clip at a time in Python, SURVEY.md §3.2 marks this
the hottest path), padding/masks static, PRNG explicit.  These watermarks
are 0-bit (presence-only): msg is ignored, bits output is empty.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import optax

from ..codec.api import CodecState
from ..codec.model import SnacCodec
from ..utils.config import CodecConfig, SemanticWMConfig
from ..utils.padding import pad_to_multiple
from .base import register

# ---------------------------------------------------------------- axes


def pca_axis(codebook: jnp.ndarray) -> jnp.ndarray:
    """First right singular vector of the mean-centered codebook
    (``watermark_testing.py:263-265``)."""
    centered = codebook - codebook.mean(axis=0, keepdims=True)
    _, _, vh = jnp.linalg.svd(centered, full_matrices=False)
    return vh[0]


def kmeans_axis(codebook: jnp.ndarray, iters: int = 10, seed: int = 42) -> jnp.ndarray:
    """Unit vector between two k-means centroids of the codebook
    (10 Lloyd iterations, fixed seed — ``watermark_testing.py:397-454``)."""
    key = jax.random.PRNGKey(seed)
    idx = jax.random.choice(key, codebook.shape[0], (2,), replace=False)
    cents = codebook[idx]

    def body(_, cents):
        d = jnp.sum((codebook[:, None, :] - cents[None, :, :]) ** 2, axis=-1)
        assign = jnp.argmin(d, axis=-1)
        def mean_of(c):
            m = (assign == c).astype(codebook.dtype)[:, None]
            return jnp.sum(codebook * m, axis=0) / jnp.maximum(m.sum(), 1.0)
        return jnp.stack([mean_of(0), mean_of(1)])

    cents = jax.lax.fori_loop(0, iters, body, cents)
    v = cents[1] - cents[0]
    return v / (jnp.linalg.norm(v) + 1e-9)


def random_axis(dim: int, seed: int = 42) -> jnp.ndarray:
    """Fixed random unit vector (``watermark_testing.py:588-597``)."""
    v = jax.random.normal(jax.random.PRNGKey(seed), (dim,))
    return v / (jnp.linalg.norm(v) + 1e-9)


# ---------------------------------------------------------------- core


def _axis_stats(params, axis: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Mean/std of the codebook's own projections along `axis` — the
    scale-free unit for semantic scores.  The reference's raw-projection
    thresholds only make sense at SNAC's particular latent scale; expressing
    projections in codebook sigmas transfers them to any codec."""
    cb = params["params"]["quantizer"]["level_0"]["codebook"]
    proj = cb @ axis
    return jnp.mean(proj), jnp.std(proj) + 1e-6


def _projections(
    codec_cfg: CodecConfig, params, wav: jnp.ndarray, axis: jnp.ndarray,
    standardize: bool = True,
) -> jnp.ndarray:
    """(B, T) -> (B, T') per-frame projections of projected latents on axis
    (the reference's ``get_projected_z`` + matmul, ``:284-288,317``),
    standardized to codebook-sigma units by default."""
    model = SnacCodec(codec_cfg)
    z = model.apply(params, wav, method="encode_latent")  # (B, T', D)
    p = params["params"]["quantizer"]["level_0"]["in_proj"]
    zp = z @ p["kernel"] + p["bias"]  # (B, T', cb_dim)
    proj = zp @ axis
    if standardize:
        mu, sd = _axis_stats(params, axis)
        proj = (proj - mu) / sd
    return proj


@functools.partial(jax.jit, static_argnames=("codec_cfg", "scfg"))
def semantic_embed(
    codec_cfg: CodecConfig,
    scfg: SemanticWMConfig,
    params,
    axis: jnp.ndarray,
    wav: jnp.ndarray,
) -> jnp.ndarray:
    """Batched Adam-PGD embed (reference inner loop ``:311-327``)."""
    x = pad_to_multiple(wav, codec_cfg.chunk, axis=-1)

    if scfg.dynamic_eps:
        rms = jnp.sqrt(jnp.mean(x * x, axis=-1, keepdims=True))
        eps = rms * 10.0 ** (-scfg.target_sdr_db / 20.0) * 2.0
        eps = jnp.clip(eps, scfg.eps_min, scfg.eps_max)  # (B, 1)
        mask = (jnp.abs(x) > eps).astype(x.dtype)
    else:
        eps = jnp.full((x.shape[0], 1), scfg.eps, x.dtype)
        mask = (jnp.abs(x) > scfg.silence_threshold).astype(x.dtype)

    opt = optax.adam(scfg.lr)

    def clip_loss(delta):
        perturbed = x + delta * mask
        proj = _projections(codec_cfg, params, perturbed, axis)  # (B, T')
        per_clip = jnp.mean(jax.nn.relu(scfg.target_score - proj), axis=-1)
        return jnp.sum(per_clip), per_clip

    grad_fn = jax.grad(clip_loss, has_aux=True)

    def body(_, carry):
        delta, opt_state = carry
        g, per_clip = grad_fn(delta)
        # per-clip early stop (reference breaks at loss < 1e-4, ``:320``)
        active = (per_clip > 1e-4).astype(x.dtype)[:, None]
        g = g * mask * active
        updates, opt_state = opt.update(g, opt_state, delta)
        delta = optax.apply_updates(delta, updates * active)
        delta = jnp.clip(delta, -eps, eps)
        return delta, opt_state

    delta0 = jnp.zeros_like(x)
    delta, _ = jax.lax.fori_loop(0, scfg.steps, body, (delta0, opt.init(delta0)))
    out = x + delta * mask
    return out[..., : wav.shape[-1]]


@functools.partial(jax.jit, static_argnames=("codec_cfg",))
def semantic_score(codec_cfg: CodecConfig, params, axis: jnp.ndarray, wav: jnp.ndarray) -> jnp.ndarray:
    """Mean projection score (reference detect, ``:337-351``)."""
    x = pad_to_multiple(wav, codec_cfg.chunk, axis=-1)
    return jnp.mean(_projections(codec_cfg, params, x, axis), axis=-1)


# ---------------------------------------------------------------- wrapper


_AXIS_BUILDERS = {
    "pca": lambda cb: pca_axis(cb),
    "kmeans": lambda cb: kmeans_axis(cb),
    "random": lambda cb: random_axis(cb.shape[1]),
}

_DEFAULT_CFGS = {
    # reference per-method constants (SURVEY.md §6 parity table)
    "pca": SemanticWMConfig(eps=5e-3, dynamic_eps=False, target_score=-1.5),
    "kmeans": SemanticWMConfig(dynamic_eps=True, target_score=1.5),
    "random": SemanticWMConfig(dynamic_eps=True, target_score=1.5),
}

_NAMES = {"pca": "SemanticPCA", "kmeans": "SemanticCluster", "random": "SemanticRandom"}


@dataclasses.dataclass(frozen=True)
class SemanticWM:
    """Presence-only manifold watermark over a codec.  n_bits = 0."""

    codec: CodecState
    axis_kind: str = "pca"
    cfg: SemanticWMConfig | None = None

    def __post_init__(self):
        if self.axis_kind not in _AXIS_BUILDERS:
            raise ValueError(f"axis_kind must be one of {sorted(_AXIS_BUILDERS)}")

    @property
    def name(self) -> str:
        return _NAMES[self.axis_kind]

    @property
    def sample_rate(self) -> int:
        return self.codec.cfg.sample_rate

    n_bits: int = 0

    @property
    def scfg(self) -> SemanticWMConfig:
        return self.cfg or _DEFAULT_CFGS[self.axis_kind]

    @property
    def axis(self) -> jnp.ndarray:
        return _AXIS_BUILDERS[self.axis_kind](self.codec.projected_codebook)

    def embed(self, wav: jnp.ndarray, msg=None, key=None) -> jnp.ndarray:
        return semantic_embed(self.codec.cfg, self.scfg, self.codec.params, self.axis, wav)

    def projections(self, wav: jnp.ndarray) -> jnp.ndarray:
        """(B, T) -> (B, T') per-frame projections in the watermark's own
        (projected, 8-dim) space — the reference's
        ``project_semantic_with_wm`` (``run_manifold_analysis_all.py:232-251``)."""
        x = pad_to_multiple(wav, self.codec.cfg.chunk, axis=-1)
        return _projections(self.codec.cfg, self.codec.params, x, self.axis)

    def score(self, wav: jnp.ndarray, msg=None) -> jnp.ndarray:
        return semantic_score(self.codec.cfg, self.codec.params, self.axis, wav)

    def detect(self, wav: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        s = self.score(wav)
        presence = jax.nn.sigmoid(4.0 * (s - self.scfg.detect_threshold))
        return presence, jnp.zeros((wav.shape[0], 0), jnp.int32)


@register("semantic_pca")
def _build_pca(codec: CodecState) -> SemanticWM:
    return SemanticWM(codec, "pca")


@register("semantic_cluster")
def _build_cluster(codec: CodecState) -> SemanticWM:
    return SemanticWM(codec, "kmeans")


@register("semantic_random")
def _build_random(codec: CodecState) -> SemanticWM:
    return SemanticWM(codec, "random")
