"""Green-list token watermark: keyed split, ratio baseline on unmarked
audio, embed raises the green ratio (reference prototype
lalm_design_test.py:12-153)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nawc_tpu.codec import make_codec
from nawc_tpu.models import TokenGreenWM, green_mask
from nawc_tpu.utils.config import CodecConfig
from tests.test_codec import warm_codec

CFG = CodecConfig(
    encoder_dim=8, latent_dim=64, decoder_dim=64,
    codebook_size=128, codebook_dim=8,
)


@pytest.fixture(scope="module")
def codec():
    return warm_codec(make_codec(jax.random.PRNGKey(0), CFG))


@pytest.fixture(scope="module")
def wav(librispeech_16k):
    from nawc_tpu.dsp import resample

    x = resample(librispeech_16k[:2], 16_000, 24_000)
    # mid-clip segment: LibriSpeech clips open with silence, and the embed's
    # silence mask (|x| > 0.01) would zero the whole delta
    return x[:, 24_000 : 24_000 + 2 * 4096]


def test_green_mask_keyed():
    m42 = np.asarray(green_mask(128, 42))
    m43 = np.asarray(green_mask(128, 43))
    assert m42.sum() == 64
    assert (m42 != m43).any()
    np.testing.assert_array_equal(m42, np.asarray(green_mask(128, 42)))  # reproducible


def test_unmarked_score_valid_and_deterministic(codec, wav):
    """Ratio in [0,1] and reproducible.  The ~0.5 unmarked baseline is a
    property of a TRAINED codec with live codebooks (integration-checked in
    the TPU benchmark); a random tiny codec collapses to few codes."""
    wm = TokenGreenWM(codec, steps=5)
    r = np.asarray(wm.score(wav))
    assert ((r >= 0) & (r <= 1)).all()
    np.testing.assert_array_equal(r, np.asarray(wm.score(wav)))


def _green_distance(codec, wav):
    """Mean cosine distance to the nearest green vector (the embed loss)."""
    from nawc_tpu.models.token_green import _normalize, _projected, green_mask
    from nawc_tpu.utils.padding import pad_to_multiple

    x = pad_to_multiple(wav, codec.cfg.chunk)
    mask = green_mask(codec.cfg.codebook_size, 42)
    cb = codec.params["params"]["quantizer"]["level_0"]["codebook"]
    green = cb[np.nonzero(np.asarray(mask))[0]]
    zn = _normalize(_projected(codec.cfg, codec.params, x))
    sims = jnp.einsum("btd,gd->btg", zn, _normalize(jnp.asarray(green)))
    return np.asarray(jnp.mean(1.0 - jnp.max(sims, axis=-1), axis=-1).mean(axis=-1))


def test_embed_moves_toward_green(codec, wav):
    """On a random codec, discrete token flips are unreliable, but the
    continuous objective (distance to green set) must decrease; token-ratio
    lift is integration-checked with the trained codec."""
    wm = TokenGreenWM(codec, steps=40, eps=0.02)
    d_before = _green_distance(codec, wav)
    marked = wm.embed(wav)
    d_after = _green_distance(codec, marked)
    assert marked.shape == wav.shape
    assert (d_after < d_before).all(), (d_before, d_after)
    assert (np.asarray(wm.score(marked)) >= np.asarray(wm.score(wav)) - 1e-6).all()
    # eps bound respected
    assert float(jnp.abs(marked - wav).max()) <= 0.0201


def test_detached_verification(codec, wav):
    """A fresh instance with only (codec, seed) verifies the embed
    (manifold_verification.py capability)."""
    embedder = TokenGreenWM(codec, steps=40, eps=0.02)
    marked = embedder.embed(wav)
    verifier = TokenGreenWM(codec, seed=42)
    p_marked, _ = verifier.detect(marked)
    p_clean, _ = verifier.detect(wav)
    assert (np.asarray(p_marked) >= np.asarray(p_clean)).all()
