"""DSP primitive tests: STFT/iSTFT round-trip, mel filterbank analytics,
polyphase resampler fidelity (SURVEY.md §4 test plan; BASELINE config #1)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nawc_tpu.dsp import (
    stft, istft, spectrogram, mel_matrix, mel_spectrogram,
    resample, resample_length, frame, overlap_add,
)
from nawc_tpu.utils.config import StftConfig, MelConfig


def si_snr(ref, est):
    ref = ref - ref.mean()
    est = est - est.mean()
    proj = np.dot(ref, est) / (np.dot(ref, ref) + 1e-12) * ref
    noise = est - proj
    return 10 * np.log10((proj**2).sum() / ((noise**2).sum() + 1e-12))


def test_frame_overlap_add_identity():
    x = np.random.default_rng(1).normal(size=2048).astype(np.float32)
    fr = frame(jnp.asarray(x), 512, 512)  # non-overlapping
    y = overlap_add(fr, 512, 2048)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-6)


@pytest.mark.parametrize("cfg", [StftConfig(1024, 256, 1024), StftConfig(512, 128, 512), StftConfig(2048, 512, 2048)])
def test_stft_istft_roundtrip(tone_24k, cfg):
    x, _ = tone_24k
    spec = stft(jnp.asarray(x), cfg)
    y = np.asarray(istft(spec, cfg, length=len(x)))
    assert si_snr(x, y) > 50.0


def test_stft_batched_shapes(tone_24k):
    x, _ = tone_24k
    xb = jnp.stack([jnp.asarray(x)] * 3)
    cfg = StftConfig()
    spec = stft(xb, cfg)
    assert spec.shape[0] == 3 and spec.shape[-1] == cfg.n_bins
    y = istft(spec, cfg, length=len(x))
    assert y.shape == (3, len(x))


def test_parseval_energy(tone_24k):
    """Spectrogram energy tracks signal energy (sanity, not exact: windowing)."""
    x, _ = tone_24k
    mag = np.asarray(spectrogram(jnp.asarray(x), StftConfig(), power=2.0))
    assert mag.sum() > 0
    # a pure half-amplitude signal has a quarter of the energy
    mag2 = np.asarray(spectrogram(jnp.asarray(0.5 * x), StftConfig(), power=2.0))
    np.testing.assert_allclose(mag2.sum() / mag.sum(), 0.25, rtol=1e-4)


def test_mel_matrix_properties():
    cfg = MelConfig(sample_rate=24_000, n_fft=1024, n_mels=80)
    fb = np.asarray(mel_matrix(cfg))
    assert fb.shape == (513, 80)
    assert (fb >= 0).all()
    # each filter has nonzero support and unimodal peak
    assert (fb.sum(axis=0) > 0).all()
    # filters are ordered in frequency
    peaks = fb.argmax(axis=0)
    assert (np.diff(peaks) >= 0).all()


def test_mel_spectrogram_shape(tone_24k):
    x, _ = tone_24k
    m = mel_spectrogram(jnp.asarray(x))
    assert m.shape[-1] == 80


def test_mel_tone_peak_location():
    """A 1 kHz tone should peak in the mel band whose center is nearest 1 kHz."""
    sr = 24_000
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    cfg = MelConfig(sample_rate=sr, n_fft=1024, n_mels=80)
    m = np.asarray(mel_spectrogram(jnp.asarray(x), StftConfig(), cfg, log=False))
    band = m.mean(axis=0).argmax()
    fb = np.asarray(mel_matrix(cfg))
    freqs = np.linspace(0, sr / 2, fb.shape[0])
    centers = freqs[fb.argmax(axis=0)]
    assert abs(centers[band] - 1000.0) < 150.0


@pytest.mark.parametrize("orig,new", [(24_000, 16_000), (16_000, 24_000), (24_000, 44_100), (44_100, 24_000)])
def test_resample_tone_fidelity(orig, new):
    dur = 0.5
    t = np.arange(int(orig * dur)) / orig
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    y = np.asarray(resample(jnp.asarray(x), orig, new))
    assert y.shape[-1] == resample_length(len(x), orig, new)
    t2 = np.arange(len(y)) / new
    ref = np.sin(2 * np.pi * 440.0 * t2).astype(np.float32)
    # ignore edges (filter transients)
    k = int(0.02 * new)
    assert si_snr(ref[k:-k], y[k:-k]) > 35.0


def test_resample_roundtrip(tone_24k):
    x, sr = tone_24k
    y = resample(jnp.asarray(x), sr, 16_000)
    z = np.asarray(resample(y, 16_000, sr))[: len(x)]
    k = 1024
    assert si_snr(x[k:-k], z[k:-k]) > 25.0


def test_resample_identity(tone_24k):
    x, sr = tone_24k
    y = np.asarray(resample(jnp.asarray(x), sr, sr))
    np.testing.assert_allclose(y, x)


def test_overlap_add_fast_path_matches_scatter():
    """win % hop == 0 uses the scatter-free shift-add path; it must agree
    with the scatter reference for overlapping and exotic geometries."""
    rng = np.random.default_rng(7)
    from nawc_tpu.dsp.stft import overlap_add as _oa

    for n_frames, win, hop in [(13, 1024, 256), (5, 512, 128), (9, 64, 16), (3, 100, 7)]:
        fr = jnp.asarray(rng.normal(size=(2, n_frames, win)).astype(np.float32))
        out_len = win + (n_frames - 1) * hop
        got = _oa(fr, hop, out_len)
        # scatter reference
        ref = np.zeros((2, out_len), np.float32)
        frn = np.asarray(fr)
        for i in range(n_frames):
            ref[:, i * hop : i * hop + win] += frn[:, i]
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4, rtol=1e-5)
        # out_len longer than coverage: zero-padded tail
        got2 = _oa(fr, hop, out_len + 37)
        np.testing.assert_allclose(np.asarray(got2[..., :out_len]), ref, atol=1e-4, rtol=1e-5)
        assert float(jnp.abs(got2[..., out_len:]).max()) == 0.0


@pytest.mark.parametrize("n_fft", [256, 1024])
def test_matmul_dft_matches_fft(n_fft):
    """The MXU matmul-DFT path (TPU default) is numerically interchangeable
    with jnp.fft on the same frames."""
    from nawc_tpu.dsp.stft import _dft_mats_np, _irfft, _rfft

    rng = np.random.default_rng(3)
    frames = jnp.asarray(rng.normal(size=(4, 11, n_fft)).astype(np.float32))
    ref_spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    import os

    os.environ["NAWC_DFT"] = "matmul"
    try:
        got_spec = _rfft(frames, n_fft)
        np.testing.assert_allclose(
            np.asarray(got_spec), np.asarray(ref_spec), atol=2e-3 * np.sqrt(n_fft), rtol=1e-4
        )
        got_x = _irfft(ref_spec, n_fft)
    finally:
        os.environ.pop("NAWC_DFT", None)
    ref_x = jnp.fft.irfft(ref_spec, n=n_fft, axis=-1)
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(ref_x), atol=1e-4, rtol=1e-4)
    # round-trip through the matmul pair reconstructs the frames
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(frames), atol=1e-3)
    cos_m, sin_m = _dft_mats_np(n_fft)
    assert cos_m.shape == (n_fft, n_fft // 2 + 1) and sin_m.shape == cos_m.shape
