"""Chunked (WavMark-style) and psychoacoustic (SilentCipher-style)
watermark families: payload round-trip, score semantics, chunk redundancy."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nawc_tpu.models import (
    ChunkedWM,
    PsychoacousticWM,
    bit_accuracy,
    bits_to_ints,
    ints_to_bits,
    random_message,
)
from nawc_tpu.dsp import resample
from nawc_tpu.eval import si_snr


def test_bits_ints_roundtrip():
    msg = jnp.asarray([[1, 2, 3, 4, 5], [0, 255, 128, 7, 200]], jnp.int32)
    bits = ints_to_bits(msg)
    assert bits.shape == (2, 40)
    np.testing.assert_array_equal(np.asarray(bits_to_ints(bits)), np.asarray(msg))


@pytest.fixture(scope="module")
def speech_3s(librispeech_16k):
    # 3 chunks of 1 s at 16 kHz
    x = jnp.concatenate([librispeech_16k[:4], librispeech_16k[4:8]], axis=-1)
    return x[:, :48_000]


def test_chunked_roundtrip(speech_3s):
    wm = ChunkedWM()
    msg = random_message(jax.random.PRNGKey(0), 4, wm.n_bits)
    marked = wm.embed(speech_3s, msg)
    assert marked.shape == speech_3s.shape
    presence, bits = wm.detect(marked)
    acc = np.asarray(bit_accuracy(bits, msg))
    assert acc.mean() > 0.97, acc
    assert (np.asarray(presence) > 0.8).all()
    # score = 1 - BER semantic
    s = np.asarray(wm.score(marked, msg))
    np.testing.assert_allclose(s, acc)
    s_clean = np.asarray(wm.score(speech_3s, msg))
    assert s_clean.mean() < 0.75


def test_chunked_redundancy_beats_single(speech_3s):
    """Aggregating 3 chunks gives larger |z| than any single second."""
    wm = ChunkedWM()
    msg = random_message(jax.random.PRNGKey(1), 4, wm.n_bits)
    marked = wm.embed(speech_3s, msg)
    noisy = marked + 0.003 * jax.random.normal(jax.random.PRNGKey(2), marked.shape)
    _, bits_all = wm.detect(noisy)
    acc_all = float(np.asarray(bit_accuracy(bits_all, msg)).mean())
    _, bits_one = wm.detect(noisy[:, :16_000])
    acc_one = float(np.asarray(bit_accuracy(bits_one, msg)).mean())
    assert acc_all >= acc_one - 0.02


def test_psychoacoustic_exact_match(librispeech_16k):
    wm = PsychoacousticWM()
    wav = resample(librispeech_16k[:2], 16_000, 44_100)
    marked = wm.embed(wav)  # default message [1,2,3,4,5]
    decoded = np.asarray(wm.decode_message(marked))
    np.testing.assert_array_equal(decoded, np.tile([1, 2, 3, 4, 5], (2, 1)))
    s = np.asarray(wm.score(marked))
    np.testing.assert_array_equal(s, [1.0, 1.0])
    s_clean = np.asarray(wm.score(wav))
    np.testing.assert_array_equal(s_clean, [0.0, 0.0])  # exact match fails on clean


def test_psychoacoustic_imperceptibility(librispeech_16k):
    wm = PsychoacousticWM()
    wav = resample(librispeech_16k[:2], 16_000, 44_100)
    marked = wm.embed(wav)
    s = np.asarray(si_snr(wav, marked))
    assert (s > 18).all(), s


def test_message_length_discovery(librispeech_16k):
    """Hardened SilentCipher capability (lalm_layer_test.py:162-184): the
    verifier discovers how many symbols are embedded without being told."""
    wav = resample(librispeech_16k[:2], 16_000, 44_100)
    for n_sym in (3, 5):
        wm = PsychoacousticWM(n_symbols=n_sym)
        msg = jnp.tile(jnp.arange(1, n_sym + 1, dtype=jnp.int32)[None], (2, 1))
        marked = wm.embed(wav, msg)
        probe = PsychoacousticWM(n_symbols=5)  # length-agnostic verifier
        assert probe.discover_message_length(marked, max_symbols=16) == n_sym
    # clean audio discovers zero
    probe = PsychoacousticWM()
    assert probe.discover_message_length(wav, max_symbols=16) == 0
