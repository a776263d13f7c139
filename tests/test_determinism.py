"""Golden determinism: identical inputs + keys -> bit-identical outputs
(the TPU answer to the reference's cuDNN-determinism knobs, SURVEY.md §5)."""

import numpy as np
import jax
import jax.numpy as jnp

from nawc_tpu.attacks import build_suite
from nawc_tpu.models import SpreadSpectrumWM, SemanticWM, random_message
from nawc_tpu.codec import make_codec
from nawc_tpu.utils.config import CodecConfig, SemanticWMConfig


def test_embed_detect_deterministic(librispeech_16k):
    wm = SpreadSpectrumWM()
    msg = random_message(jax.random.PRNGKey(0), 2, wm.n_bits)
    wav = librispeech_16k[:2]
    m1 = np.asarray(wm.embed(wav, msg))
    m2 = np.asarray(wm.embed(wav, msg))
    np.testing.assert_array_equal(m1, m2)
    p1, b1 = wm.detect(jnp.asarray(m1))
    p2, b2 = wm.detect(jnp.asarray(m1))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))


def test_randomized_attacks_keyed(librispeech_16k):
    """Stochastic attacks are pure functions of their PRNG key."""
    suite = build_suite(16_000)
    wav = librispeech_16k[:2]
    for name in ("gaussian_noise", "background_noise", "eq", "time_jitter", "reverb"):
        k = jax.random.PRNGKey(7)
        a1 = np.asarray(suite[name](wav, k))
        a2 = np.asarray(suite[name](wav, k))
        np.testing.assert_array_equal(a1, a2, err_msg=name)
        a3 = np.asarray(suite[name](wav, jax.random.PRNGKey(8)))
        assert (a1 != a3).any(), name


def test_semantic_axes_reproducible():
    cfg = CodecConfig(encoder_dim=8, latent_dim=64, decoder_dim=64,
                      codebook_size=128, codebook_dim=8)
    codec = make_codec(jax.random.PRNGKey(0), cfg)
    for kind in ("pca", "kmeans", "random"):
        a1 = np.asarray(SemanticWM(codec, kind).axis)
        a2 = np.asarray(SemanticWM(codec, kind).axis)
        np.testing.assert_array_equal(a1, a2)
