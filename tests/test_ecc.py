"""Hamming(12,8) SEC: round-trip, single-error correction, double-error
detection limits; psychoacoustic exact-match survives bit flips."""

import numpy as np
import jax.numpy as jnp

from nawc_tpu.utils.ecc import hamming_decode, hamming_encode, hamming_soft_decode


def test_roundtrip_all_bytes():
    data = jnp.asarray([[(b >> (7 - i)) & 1 for i in range(8)] for b in range(256)], jnp.int32)
    coded = hamming_encode(data)
    assert coded.shape == (256, 12)
    back, nerr = hamming_decode(coded)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(data))
    np.testing.assert_array_equal(np.asarray(nerr), 0)


def test_corrects_every_single_bit_error():
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, 2, (50, 8)), jnp.int32)
    coded = np.asarray(hamming_encode(data))
    for pos in range(12):
        corrupted = coded.copy()
        corrupted[:, pos] ^= 1
        back, nerr = hamming_decode(jnp.asarray(corrupted))
        np.testing.assert_array_equal(np.asarray(back), np.asarray(data))
        np.testing.assert_array_equal(np.asarray(nerr), 1)


def test_soft_decode_matches_hard_on_clean_codewords():
    data = jnp.asarray([[(b >> (7 - i)) & 1 for i in range(8)] for b in range(256)], jnp.int32)
    llr = 2.0 * hamming_encode(data).astype(jnp.float32) - 1.0
    back, byte = hamming_soft_decode(3.0 * llr)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(data))
    np.testing.assert_array_equal(np.asarray(byte), np.arange(256))


def test_soft_decode_fixes_low_confidence_double_flip():
    """Two flips defeat syndrome decoding (d_min=3, mis-corrects), but ML
    soft decoding recovers when the flipped bits carry low confidence."""
    rng = np.random.default_rng(1)
    data = jnp.asarray(rng.integers(0, 2, (64, 8)), jnp.int32)
    llr = 3.0 * (2.0 * np.asarray(hamming_encode(data), np.float32) - 1.0)
    for row in range(llr.shape[0]):
        i, j = rng.choice(12, size=2, replace=False)
        llr[row, i] *= -0.1  # flipped sign, low magnitude
        llr[row, j] *= -0.1
    back, _ = hamming_soft_decode(jnp.asarray(llr))
    assert (np.asarray(back) == np.asarray(data)).all(axis=-1).mean() > 0.95


def test_soft_decode_random_llr_is_uniform_over_bytes():
    rng = np.random.default_rng(2)
    llr = jnp.asarray(rng.normal(size=(2048, 12)).astype(np.float32))
    _, byte = hamming_soft_decode(llr)
    counts = np.bincount(np.asarray(byte), minlength=256)
    assert counts.max() < 40  # no systematic bias toward any codeword
