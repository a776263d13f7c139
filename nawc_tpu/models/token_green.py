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


@functools.lru_cache(maxsize=8)
def _null_mask_matrix(vocab_size: int, seed: int, k: int = 64):
    """(k, vocab) float32 numpy matrix of WRONG-KEY half splits — the
    permutation null for the calibrated z detection statistic.  Host numpy
    (cached as numpy, not jnp — CLAUDE.md lru_cache/tracer rule); seeds are
    decorrelated from the true key's jax permutation by construction."""
    import numpy as np

    rows = np.zeros((k, vocab_size), np.float32)
    for i in range(k):
        rng = np.random.default_rng(1_000_003 * (seed + 1) + i)
        rows[i, rng.permutation(vocab_size)[: vocab_size // 2]] = 1.0
    return rows


def _projected(codec_cfg: CodecConfig, params, wav: jnp.ndarray) -> jnp.ndarray:
    model = SnacCodec(codec_cfg)
    z = model.apply(params, wav, method="encode_latent")
    p = params["params"]["quantizer"]["level_0"]["in_proj"]
    return z @ p["kernel"] + p["bias"]  # (B, T', cb_dim)


def _normalize(x, axis=-1):
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=axis, keepdims=True) + 1e-8)


@functools.partial(
    jax.jit, static_argnames=("codec_cfg", "n_steps", "lr", "margin")
)
def _green_phase(
    codec_cfg: CodecConfig,
    n_steps: int,
    lr: float,
    margin: float,
    params,
    mask: jnp.ndarray,
    x: jnp.ndarray,
    silence: jnp.ndarray,
    r2: jnp.ndarray,
    cap: jnp.ndarray,
    delta: jnp.ndarray,
    opt_state,
):
    """`n_steps` Adam steps as ONE bounded dispatch (the axon worker
    kernel-faults on single dispatches running >~150 s on-device — crash
    matrix in ``semantic.semantic_embed``; this loop at 24 x 5 s x 300
    steps was the last unbounded one and took the worker down in the r4
    staged6 benchmark_semantic stage)."""
    cb = params["params"]["quantizer"]["level_0"]["codebook"]
    cn = _normalize(cb)
    green_col = mask[None, None, :]  # (1, 1, K) bool
    opt = optax.adam(lr)

    def loss_fn(delta):
        zp = _projected(codec_cfg, params, x + delta * silence)
        zn = _normalize(zp)
        # cosine scores against ALL codes (the codec's own lookup metric,
        # so "green" here == "green" at detect time)
        sims = jnp.einsum("btd,kd->btk", zn, cn)
        best_green = jnp.max(jnp.where(green_col, sims, -2.0), axis=-1)
        best_red = jnp.max(jnp.where(green_col, -2.0, sims), axis=-1)
        return jnp.mean(jax.nn.relu(margin - (best_green - best_red)))

    grad_fn = jax.grad(loss_fn)

    def body(_, carry):
        delta, opt_state = carry
        g = grad_fn(delta) * silence
        updates, opt_state = opt.update(g, opt_state, delta)
        delta = optax.apply_updates(delta, updates)
        norm = jnp.sqrt(jnp.sum(delta * delta, axis=-1, keepdims=True)) + 1e-12
        delta = delta * jnp.minimum(1.0, r2 / norm)
        delta = jnp.clip(delta, -cap, cap)
        return delta, opt_state

    return jax.lax.fori_loop(0, n_steps, body, (delta, opt_state))


def green_embed(
    codec_cfg: CodecConfig,
    params,
    mask: jnp.ndarray,
    wav: jnp.ndarray,
    steps: int = 300,
    lr: float = 5e-3,
    target_sdr_db: float = 31.0,
    margin: float = 0.1,
    max_steps_per_dispatch: int = 75,
) -> jnp.ndarray:
    """Push every frame's projected latent across the green/red boundary
    WITH MARGIN (reference loss is plain min-distance-to-green,
    ``lalm_design_test.py:100-130``; the margin hinge is a round-2 deviation
    — it spends the budget only on frames not yet robustly green, which is
    what moves the green-token RATIO, the actual detection statistic).
    Budget: L2 ball from the target SDR plus a peak cap, as in
    ``semantic.semantic_embed``."""
    x = pad_to_multiple(wav, codec_cfg.chunk, axis=-1)
    rms = jnp.sqrt(jnp.mean(x * x, axis=-1, keepdims=True))
    amp = rms * 10.0 ** (-target_sdr_db / 20.0)
    r2 = amp * jnp.sqrt(jnp.asarray(x.shape[-1], x.dtype))
    cap = 6.0 * amp
    silence = (jnp.abs(x) > amp).astype(x.dtype)

    delta = jnp.zeros_like(x)
    opt_state = optax.adam(lr).init(delta)
    remaining = steps
    while remaining > 0:
        n = min(remaining, max(1, max_steps_per_dispatch))
        remaining -= n
        delta, opt_state = _green_phase(
            codec_cfg, n, lr, margin, params, mask, x, silence, r2, cap,
            delta, opt_state,
        )
    return (x + delta * silence)[..., : wav.shape[-1]]


@dataclasses.dataclass(frozen=True)
class TokenGreenWM:
    """Presence-only token-space watermark.  score = green-token ratio."""

    codec: CodecState
    seed: int = 42
    steps: int = 300
    lr: float = 5e-3
    target_sdr_db: float = 31.0
    margin: float = 0.1
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
            steps=self.steps, lr=self.lr,
            target_sdr_db=self.target_sdr_db, margin=self.margin,
        )

    def _codes(self, wav: jnp.ndarray) -> jnp.ndarray:
        x = pad_to_multiple(wav, self.codec.cfg.chunk, axis=-1)
        return self.codec.encode(x)[0]  # (B, T0)

    def green_ratio(self, wav: jnp.ndarray) -> jnp.ndarray:
        """The reference's raw statistic: green-token ratio of level-0 codes
        (``get_green_ratio``, ``lalm_design_test.py:53-66``).  ~0.5 unmarked
        in expectation, but with heavy per-clip content bias (codes repeat,
        so the effective sample size is far below T0 — one unmarked 5 s
        LibriSpeech clip reads 0.68)."""
        is_green = jnp.take(self.mask, self._codes(wav)).astype(jnp.float32)
        return jnp.mean(is_green, axis=-1)

    def score(self, wav: jnp.ndarray, msg=None) -> jnp.ndarray:
        """Calibrated permutation-null z, scaled so the reference's 0.75
        ratio gate maps to z = 3 (score = z/4, gate 0.75 <=> 3 sigma).

        DOCUMENTED DEVIATION from ``lalm_design_test.py:53-66`` (same class
        as the semantic methods' z-score detect): the raw green ratio has
        per-clip content bias — repeated codes shrink the effective sample,
        so the clean null is wide (measured sd 0.071 at 24x5 s, AUC 0.82 at
        any fixed ratio gate).  Here the clip's OWN wrong-key ratio
        distribution (64 permutation splits of the same codes) supplies the
        null: z = (ratio_true - mean_null) / sd_null.  sd_null is floored at
        the iid binomial sd so confident clips cannot produce unbounded z.
        ``green_ratio`` keeps the reference's raw statistic."""
        codes = self._codes(wav)
        r_true = jnp.mean(jnp.take(self.mask, codes).astype(jnp.float32), axis=-1)
        nm = jnp.asarray(_null_mask_matrix(self.codec.cfg.codebook_size, self.seed))
        null = jnp.take(nm, codes, axis=1)  # (K, B, T0)
        r_null = jnp.mean(null, axis=-1)  # (K, B)
        mu = jnp.mean(r_null, axis=0)
        sd_floor = 0.5 * jax.lax.rsqrt(jnp.asarray(codes.shape[-1], jnp.float32))
        sd = jnp.maximum(jnp.std(r_null, axis=0), sd_floor)
        z = (r_true - mu) / sd
        return z / 4.0

    def detect(self, wav: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        presence = jax.nn.sigmoid(12.0 * (self.score(wav) - 0.75))
        return presence, jnp.zeros((wav.shape[0], 0), jnp.int32)


@register("token_green")
def _build(codec: CodecState, seed: int = 42) -> TokenGreenWM:
    return TokenGreenWM(codec, seed)
