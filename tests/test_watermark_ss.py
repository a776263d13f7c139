"""Spread-spectrum watermark: clean-channel bit accuracy, presence
separation, imperceptibility, and key specificity on real speech
(BASELINE config #3; SURVEY.md §4 test plan)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nawc_tpu.models import SpreadSpectrumWM, random_message, bit_accuracy
from nawc_tpu.eval import si_snr, snr


@pytest.fixture(scope="module")
def wm():
    return SpreadSpectrumWM()


@pytest.fixture(scope="module")
def marked_setup(librispeech_16k, wm):
    msg = random_message(jax.random.PRNGKey(1), librispeech_16k.shape[0], wm.n_bits)
    marked = wm.embed(librispeech_16k, msg)
    return msg, marked


def test_clean_channel_bits(marked_setup, wm):
    msg, marked = marked_setup
    presence, bits = wm.detect(marked)
    acc = np.asarray(bit_accuracy(bits, msg))
    assert acc.mean() > 0.97, acc
    assert (np.asarray(presence) > 0.7).all(), presence


def test_unmarked_low_presence(librispeech_16k, wm):
    presence, _ = wm.detect(librispeech_16k)
    assert (np.asarray(presence) < 0.35).all(), presence


def test_imperceptibility(librispeech_16k, marked_setup):
    _, marked = marked_setup
    s = np.asarray(si_snr(librispeech_16k, marked))
    assert (s > 18.0).all(), s  # designed WM target ~22 dB (module docstring)
    assert (np.abs(np.asarray(marked)) <= 1.0).all()


def test_wrong_key_no_detection(librispeech_16k, marked_setup):
    msg, marked = marked_setup
    wm_b = SpreadSpectrumWM(seed=123)
    presence_b, bits_b = wm_b.detect(marked)
    assert (np.asarray(presence_b) < 0.5).all()
    acc = np.asarray(bit_accuracy(bits_b, msg))
    assert acc.mean() < 0.75  # wrong key decodes noise


def test_score_with_payload_separates(librispeech_16k, marked_setup, wm):
    msg, marked = marked_setup
    s_marked = np.asarray(wm.score(marked, msg))
    s_clean = np.asarray(wm.score(librispeech_16k, msg))
    assert (s_marked > 0.8).all(), s_marked
    assert (s_clean < 0.4).all(), s_clean


def test_additive_noise_robustness(marked_setup, wm):
    msg, marked = marked_setup
    noisy = marked + 0.001 * jax.random.normal(jax.random.PRNGKey(6), marked.shape)
    _, bits = wm.detect(noisy)
    acc = np.asarray(bit_accuracy(bits, msg))
    assert acc.mean() > 0.95


def test_metrics_sanity(librispeech_16k):
    s = np.asarray(si_snr(librispeech_16k, librispeech_16k))
    assert (s > 60).all()
    n = np.asarray(snr(librispeech_16k, librispeech_16k * 0.999))
    assert (n > 40).all()


def test_sync_detection_recovers_shifts(librispeech_16k, wm, marked_setup):
    """FFT lag search decodes bits under arbitrary time shifts where plain
    detection fails (the production sync story; plain detect is shift-naive)."""
    msg, marked = marked_setup
    shifted = jnp.roll(marked, 5000, axis=-1)
    _, bits_plain = wm.detect(shifted)
    assert np.asarray(bit_accuracy(bits_plain, msg)).mean() < 0.7  # broken
    presence, bits, lag = wm.detect_sync(shifted)
    assert np.asarray(bit_accuracy(bits, msg)).mean() > 0.9
    assert (np.asarray(lag) == 20).mean() > 0.5  # 5000/256 ~ 19.5 frames
    assert (np.asarray(presence) > 0.5).all()
    # clean audio stays cold even with lag selection
    p_clean, _, _ = wm.detect_sync(librispeech_16k)
    assert (np.asarray(p_clean) < 0.3).all()
