"""Green-list token watermark: bias codec TOKENS toward a keyed half of the
codebook (LLM-style green/red list, in audio token space).

TPU rebuild of the reference prototype ``SemanticWatermarker``
(``watermark_research/src/misc/lalm_design_test.py:12-153``): a seed-42
permutation splits the level-0 vocabulary in half; embed optimizes a
silence-masked waveform delta so projected encoder latents minimize their
distance to the nearest GREEN codebook vector (200 Adam steps, lr 5e-3,
eps 0.01); detect = fraction of level-0 codes that are green (baseline 0.5
on unmarked audio).  Here the embed loop is one batched jitted fori_loop and
detection reuses the codec's Pallas nearest-codebook lookup.

Detached verification (the reference's ``manifold_verification.py`` idea):
the green set is reproducible from (seed, codebook) alone, so any party with
the codec checkpoint and the seed can verify without the embedder instance.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import optax

from ..codec.api import CodecState
from ..codec.model import SnacCodec
from ..utils.config import CodecConfig
from ..utils.padding import pad_to_multiple
from .base import register


def green_mask(vocab_size: int, seed: int = 42) -> jnp.ndarray:
    """(vocab,) bool — seed-keyed half split (``lalm_design_test.py:46-50``)."""
    perm = jax.random.permutation(jax.random.PRNGKey(seed), vocab_size)
    mask = jnp.zeros(vocab_size, bool)
    return mask.at[perm[: vocab_size // 2]].set(True)


def _projected(codec_cfg: CodecConfig, params, wav: jnp.ndarray) -> jnp.ndarray:
    model = SnacCodec(codec_cfg)
    z = model.apply(params, wav, method="encode_latent")
    p = params["params"]["quantizer"]["level_0"]["in_proj"]
    return z @ p["kernel"] + p["bias"]  # (B, T', cb_dim)


def _normalize(x, axis=-1):
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=axis, keepdims=True) + 1e-8)


@functools.partial(jax.jit, static_argnames=("codec_cfg", "steps"))
def green_embed(
    codec_cfg: CodecConfig,
    params,
    mask: jnp.ndarray,
    wav: jnp.ndarray,
    steps: int = 200,
    lr: float = 5e-3,
    eps: float = 0.01,
) -> jnp.ndarray:
    """Pull every frame's projected latent toward its nearest green vector
    (reference loss: mean min-distance-to-green, ``:100-130``)."""
    x = pad_to_multiple(wav, codec_cfg.chunk, axis=-1)
    cb = params["params"]["quantizer"]["level_0"]["codebook"]
    green = cb[jnp.nonzero(mask, size=mask.shape[0] // 2)[0]]  # (G, D)
    green_n = _normalize(green)
    silence = (jnp.abs(x) > 0.01).astype(x.dtype)
    opt = optax.adam(lr)

    def loss_fn(delta):
        zp = _projected(codec_cfg, params, x + delta * silence)
        zn = _normalize(zp)
        # cosine distance to the nearest green vector (the codec's own
        # lookup metric, so "green" here == "green" at detect time)
        sims = jnp.einsum("btd,gd->btg", zn, green_n)
        return jnp.mean(1.0 - jnp.max(sims, axis=-1))

    grad_fn = jax.grad(loss_fn)

    def body(_, carry):
        delta, opt_state = carry
        g = grad_fn(delta) * silence
        updates, opt_state = opt.update(g, opt_state, delta)
        delta = jnp.clip(optax.apply_updates(delta, updates), -eps, eps)
        return delta, opt_state

    d0 = jnp.zeros_like(x)
    delta, _ = jax.lax.fori_loop(0, steps, body, (d0, opt.init(d0)))
    return (x + delta * silence)[..., : wav.shape[-1]]


@dataclasses.dataclass(frozen=True)
class TokenGreenWM:
    """Presence-only token-space watermark.  score = green-token ratio."""

    codec: CodecState
    seed: int = 42
    steps: int = 200
    lr: float = 5e-3
    eps: float = 0.01
    name: str = "token_green"
    n_bits: int = 0

    @property
    def sample_rate(self) -> int:
        return self.codec.cfg.sample_rate

    @property
    def mask(self) -> jnp.ndarray:
        return green_mask(self.codec.cfg.codebook_size, self.seed)

    def embed(self, wav: jnp.ndarray, msg=None, key=None) -> jnp.ndarray:
        return green_embed(
            self.codec.cfg, self.codec.params, self.mask, wav,
            steps=self.steps, lr=self.lr, eps=self.eps,
        )

    def score(self, wav: jnp.ndarray, msg=None) -> jnp.ndarray:
        """Green-token ratio of level-0 codes (``get_green_ratio``,
        ``lalm_design_test.py:53-66``).  ~0.5 unmarked."""
        x = pad_to_multiple(wav, self.codec.cfg.chunk, axis=-1)
        codes = self.codec.encode(x)[0]  # (B, T0)
        is_green = jnp.take(self.mask, codes).astype(jnp.float32)
        return jnp.mean(is_green, axis=-1)

    def detect(self, wav: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        ratio = self.score(wav)
        presence = jax.nn.sigmoid(12.0 * (ratio - 0.75))
        return presence, jnp.zeros((wav.shape[0], 0), jnp.int32)


@register("token_green")
def _build(codec: CodecState, seed: int = 42) -> TokenGreenWM:
    return TokenGreenWM(codec, seed)
