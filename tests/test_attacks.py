"""Attack suite tests: every attack preserves shape/finiteness and degrades
the signal in its characteristic way; codec round-trip + ablation masks; PGD
reduces a differentiable score (SURVEY.md §4 plan; BASELINE config #4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nawc_tpu.attacks import (
    ablation_masks,
    build_suite,
    codec_roundtrip,
    layer_ablation,
    pgd_attack,
    subspace_pgd_attack,
)
from nawc_tpu.codec import make_codec
from nawc_tpu.eval import si_snr, snr
from nawc_tpu.models import SpreadSpectrumWM, random_message, bit_accuracy
from nawc_tpu.utils.config import CodecConfig

CFG = CodecConfig(
    encoder_dim=8, latent_dim=64, decoder_dim=64,
    codebook_size=128, codebook_dim=8,
)


from tests.test_codec import warm_codec


@pytest.fixture(scope="module")
def codec():
    return warm_codec(make_codec(jax.random.PRNGKey(0), CFG))


@pytest.fixture(scope="module")
def suite(codec):
    return build_suite(sr=16_000, codec=codec)


def test_suite_covers_reference_attacks(suite):
    reference_attacks = {
        "aac", "background_noise", "dac", "dynamic_range_compression",
        "dynamic_range_expansion", "encodec", "eq", "gain", "gaussian_noise",
        "highpass", "limiter", "lowpass", "mp3", "phase_shift", "polarity",
        "quantization", "reverb", "time_jitter", "time_stretch", "vorbis",
    }
    assert reference_attacks <= set(suite)


def test_all_attacks_shape_and_finite(librispeech_16k, suite):
    wav = librispeech_16k[:2]
    key = jax.random.PRNGKey(0)
    for name, fn in suite.items():
        out = fn(wav, key)
        assert out.shape == wav.shape, name
        assert bool(jnp.isfinite(out).all()), name


def test_characteristic_behaviors(librispeech_16k, suite):
    wav = librispeech_16k[:2]
    key = jax.random.PRNGKey(1)
    np.testing.assert_allclose(np.asarray(suite["polarity"](wav, key)), -np.asarray(wav))
    # gaussian noise lands near the anchored SNR (51 dB = the reference
    # benchmark's measured sisnr_attack, stats_by_attack.csv)
    noisy = suite["gaussian_noise"](wav, key)
    measured = np.asarray(snr(wav, noisy))
    assert (np.abs(measured - 51.0) < 2.0).all(), measured
    # lowpass (anchored cutoff 5 kHz) removes energy above 6 kHz
    # (rfft bin k of a 2 s clip = k/2 Hz)
    hf = np.abs(np.fft.rfft(np.asarray(wav[0])))[12000:]
    hf_lp = np.abs(np.fft.rfft(np.asarray(suite["lowpass"](wav, key)[0])))[12000:]
    assert hf_lp.sum() < 0.5 * hf.sum()
    # quantization: exact idempotence
    q1 = suite["quantization"](wav, key)
    q2 = suite["quantization"](q1, key)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-7)
    # phase shift preserves the magnitude spectrum (approximately: the
    # pow2-padded FFT crops the Hilbert leakage tail, so per-bin equality
    # is no longer exact — check energy + loose per-bin agreement)
    w0 = np.abs(np.fft.rfft(np.asarray(wav[0])))
    wp = np.abs(np.fft.rfft(np.asarray(suite["phase_shift"](wav, key)[0])))
    assert abs(np.sum(wp**2) / np.sum(w0**2) - 1.0) < 0.02
    band = lambda m: np.add.reduceat(m**2, np.arange(0, len(m), 256))
    np.testing.assert_allclose(band(wp), band(w0), rtol=0.2, atol=1e-3)
    # time stretch is a playback-rate warp: a pure tone comes back at the
    # scaled frequency, and the tail past T*rate is silence
    sr, secs = 16_000, 2
    tt = np.arange(sr * secs) / sr
    tone = jnp.asarray(np.sin(2 * np.pi * 440.0 * tt, dtype=np.float32))[None, :]
    st = np.asarray(suite["time_stretch"](tone, key)[0])
    spec = np.abs(np.fft.rfft(st * np.hanning(len(st))))
    peak_hz = np.argmax(spec) / secs
    assert abs(peak_hz - 440.0 * 10_000 / 9_999) < 1.0, peak_hz
    from nawc_tpu.attacks import dsp as _dsp

    st95 = np.asarray(_dsp.time_stretch(tone, 9_500)[0])
    n_live = int(len(st) * 0.95)
    assert np.abs(st95[n_live + 16:]).max() == 0.0
    assert np.sqrt(np.mean(st95[: n_live - 16] ** 2)) > 0.5  # warped tone present
    spec95 = np.abs(np.fft.rfft(st95[:n_live] * np.hanning(n_live)))
    peak95_hz = np.argmax(spec95) * sr / n_live
    assert abs(peak95_hz - 440.0 / 0.95) < 2.0, peak95_hz


def test_codec_roundtrip_shapes(codec, librispeech_16k):
    wav = librispeech_16k[:2]
    out = codec_roundtrip(codec, wav, in_sr=16_000)
    assert out.shape == wav.shape
    assert bool(jnp.isfinite(out).all())


def test_layer_ablation_families(codec, librispeech_16k):
    wav = librispeech_16k[:1]
    masks = ablation_masks(CFG.num_levels)
    assert set(masks) == {"full_all", "drop_last_1", "drop_last_2",
                          "keep_only_0", "keep_only_1", "keep_only_2"}
    full = layer_ablation(codec, wav, masks["full_all"], in_sr=16_000)
    rt = codec_roundtrip(codec, wav, in_sr=16_000)
    np.testing.assert_allclose(np.asarray(full), np.asarray(rt), atol=5e-3)
    dropped = layer_ablation(codec, wav, masks["keep_only_0"], in_sr=16_000)
    assert not np.allclose(np.asarray(dropped), np.asarray(full), atol=1e-3)


def test_pgd_reduces_watermark_score(librispeech_16k):
    wm = SpreadSpectrumWM()
    wav = librispeech_16k[:2]
    msg = random_message(jax.random.PRNGKey(2), 2, wm.n_bits)
    marked = wm.embed(wav, msg)
    score_before = np.asarray(wm.score(marked, msg))
    attacked = pgd_attack(lambda w: wm.score(w, msg), marked, steps=20, eps=0.02, lr=0.002)
    score_after = np.asarray(wm.score(attacked, msg))
    assert (score_after < score_before - 0.2).all(), (score_before, score_after)
    # perturbation bounded
    assert float(jnp.abs(attacked - marked).max()) <= 0.021


def test_subspace_pgd_protects_head(codec, librispeech_16k):
    wm = SpreadSpectrumWM()
    wav = librispeech_16k[:1]
    msg = random_message(jax.random.PRNGKey(3), 1, wm.n_bits)
    marked = wm.embed(wav, msg)

    def latent_fn(w):
        from nawc_tpu.utils.padding import pad_to_multiple
        return codec.encode_latent(pad_to_multiple(w, CFG.chunk))

    # arbitrary orthonormal "content" basis over latent dim
    basis = jnp.eye(CFG.latent_dim)[:8]
    out = subspace_pgd_attack(
        lambda w: wm.score(w, msg), latent_fn, marked, basis,
        steps=10, eps=0.02, lr=0.002,
    )
    assert out.shape == marked.shape
    assert bool(jnp.isfinite(out).all())


def test_attacked_watermark_partial_survival(librispeech_16k, suite):
    """Benign attacks keep bit accuracy well above chance."""
    wm = SpreadSpectrumWM()
    wav = librispeech_16k[:4]
    msg = random_message(jax.random.PRNGKey(4), 4, wm.n_bits)
    marked = wm.embed(wav, msg)
    key = jax.random.PRNGKey(5)
    for name in ("gaussian_noise", "quantization", "limiter", "gain"):
        _, bits = wm.detect(suite[name](marked, key))
        acc = float(np.asarray(bit_accuracy(bits, msg)).mean())
        assert acc > 0.8, (name, acc)
