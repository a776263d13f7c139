"""Hamming(12,8) SEC: round-trip, single-error correction, double-error
detection limits; psychoacoustic exact-match survives bit flips."""

import numpy as np
import jax.numpy as jnp

from nawc_tpu.utils.ecc import hamming_decode, hamming_encode


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
