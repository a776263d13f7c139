"""Batched, jit-safe DSP attack suite.

Reproduces the raw_bench 20-attack families the reference evaluates against
(attack list in ``interpretability_research/outputs/audioseal_stats_loose/
stats_by_attack.csv:2-21``: aac, background_noise, dac,
dynamic_range_compression/expansion, encodec, eq, gain, gaussian_noise,
highpass, limiter, lowpass, mp3, phase_shift, polarity, quantization, reverb,
time_jitter, time_stretch, vorbis) as pure-jnp transforms over (B, T)
waveforms — no host round-trips, differentiable where the math allows.

mp3/aac/vorbis have no FFmpeg here (zero-egress image): they are implemented
as an on-device *perceptual-codec surrogate* (band-limited + masked spectral
quantization), clearly flagged; `encodec`/`dac` use the framework's own
neural codec round-trip (see attacks/codec.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.stft import stft, istft
from ..utils.config import StftConfig
from ..utils.padding import fix_length

# ---------------------------------------------------------------- helpers


def _fir_filter(wav: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Zero-phase-ish FIR via 'SAME' convolution along the last axis."""
    lead = wav.shape[:-1]
    flat = wav.reshape((-1, 1, wav.shape[-1]))
    k = kernel.reshape(1, 1, -1)
    out = jax.lax.conv_general_dilated(
        flat, k, (1,), [(kernel.shape[0] // 2, (kernel.shape[0] - 1) // 2)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out.reshape(lead + (out.shape[-1],))


@functools.lru_cache(maxsize=64)
def _sinc_kernel(cutoff: float, sr: int, taps: int = 101, high: bool = False) -> np.ndarray:
    """Hamming-windowed sinc low/high-pass kernel (host-built, static)."""
    fc = cutoff / (sr / 2)
    n = np.arange(taps) - (taps - 1) / 2
    h = fc * np.sinc(fc * n)
    h *= np.hamming(taps)
    h /= h.sum()
    if high:
        imp = np.zeros(taps)
        imp[(taps - 1) // 2] = 1.0
        h = imp - h
    return h.astype(np.float32)


def _frame_rms_db(wav: jnp.ndarray, frame: int = 256) -> jnp.ndarray:
    """(B, T) -> (B, T//frame) per-frame RMS in dBFS."""
    t = wav.shape[-1] - wav.shape[-1] % frame
    x = wav[..., :t].reshape(wav.shape[:-1] + (t // frame, frame))
    rms = jnp.sqrt(jnp.mean(x * x, axis=-1) + 1e-10)
    return 20.0 * jnp.log10(rms + 1e-10)


# ---------------------------------------------------------------- attacks


@jax.jit
def gain(wav: jnp.ndarray, factor: float = 2.0) -> jnp.ndarray:
    return jnp.clip(wav * factor, -1.0, 1.0)


@jax.jit
def polarity(wav: jnp.ndarray) -> jnp.ndarray:
    return -wav


@functools.partial(jax.jit, static_argnames=("snr_db",))
def gaussian_noise(wav: jnp.ndarray, key: jax.Array, snr_db: float = 40.0) -> jnp.ndarray:
    p_sig = jnp.mean(wav**2, axis=-1, keepdims=True)
    sigma = jnp.sqrt(p_sig * 10.0 ** (-snr_db / 10.0))
    return wav + sigma * jax.random.normal(key, wav.shape)


@functools.partial(jax.jit, static_argnames=("snr_db",))
def background_noise(wav: jnp.ndarray, key: jax.Array, snr_db: float = 25.0) -> jnp.ndarray:
    """Colored (speech-shaped, low-pass) noise at the given SNR."""
    n = jax.random.normal(key, wav.shape)
    n = _fir_filter(n, jnp.asarray(_sinc_kernel(2000.0, 16_000)))
    p_sig = jnp.mean(wav**2, axis=-1, keepdims=True)
    p_n = jnp.mean(n**2, axis=-1, keepdims=True)
    n = n * jnp.sqrt(p_sig / (p_n + 1e-12) * 10.0 ** (-snr_db / 10.0))
    return wav + n


@functools.partial(jax.jit, static_argnames=("cutoff_hz", "sr"))
def lowpass(wav: jnp.ndarray, cutoff_hz: float = 3500.0, sr: int = 16_000) -> jnp.ndarray:
    return _fir_filter(wav, jnp.asarray(_sinc_kernel(cutoff_hz, sr)))


@functools.partial(jax.jit, static_argnames=("cutoff_hz", "sr"))
def highpass(wav: jnp.ndarray, cutoff_hz: float = 500.0, sr: int = 16_000) -> jnp.ndarray:
    return _fir_filter(wav, jnp.asarray(_sinc_kernel(cutoff_hz, sr, high=True)))


@functools.partial(jax.jit, static_argnames=("sr", "n_bumps", "depth_db"))
def eq(
    wav: jnp.ndarray, key: jax.Array, sr: int = 16_000, n_bumps: int = 5,
    depth_db: float = 6.0,
) -> jnp.ndarray:
    """Random multi-band EQ: ±depth_db gaussian bumps applied zero-phase."""
    taps = 257
    n_bins = taps // 2 + 1
    freqs = jnp.linspace(0.0, 1.0, n_bins)
    k1, k2, k3 = jax.random.split(key, 3)
    centers = jax.random.uniform(k1, (n_bumps,), minval=0.05, maxval=0.9)
    widths = jax.random.uniform(k2, (n_bumps,), minval=0.02, maxval=0.15)
    gains = jax.random.uniform(k3, (n_bumps,), minval=-depth_db, maxval=depth_db)
    resp_db = jnp.sum(
        gains[:, None] * jnp.exp(-0.5 * ((freqs[None, :] - centers[:, None]) / widths[:, None]) ** 2),
        axis=0,
    )
    mag = 10.0 ** (resp_db / 20.0)
    h = jnp.fft.irfft(mag.astype(jnp.complex64), n=taps)
    h = jnp.roll(h, taps // 2) * jnp.asarray(np.hamming(taps).astype(np.float32))
    return _fir_filter(wav, h)


@functools.partial(jax.jit, static_argnames=("n_bits",))
def quantization(wav: jnp.ndarray, n_bits: int = 8) -> jnp.ndarray:
    scale = float(2 ** (n_bits - 1))
    return jnp.round(wav * scale) / scale


@functools.partial(jax.jit, static_argnames=("thresh_db", "ratio", "frame"))
def dynamic_range_compression(
    wav: jnp.ndarray, thresh_db: float = -25.0, ratio: float = 4.0, frame: int = 256
) -> jnp.ndarray:
    """Frame-RMS compressor (above-threshold gain reduction)."""
    db = _frame_rms_db(wav, frame)
    gain_db = jnp.where(db > thresh_db, (thresh_db - db) * (1.0 - 1.0 / ratio), 0.0)
    lin = 10.0 ** (gain_db / 20.0)
    lin = jnp.repeat(lin, frame, axis=-1)
    lin = fix_length(lin, wav.shape[-1])
    lin = jnp.where(lin == 0, 1.0, lin)
    return wav * lin


@functools.partial(jax.jit, static_argnames=("thresh_db", "ratio", "frame"))
def dynamic_range_expansion(
    wav: jnp.ndarray, thresh_db: float = -35.0, ratio: float = 2.0, frame: int = 256
) -> jnp.ndarray:
    """Downward expander: attenuates below-threshold frames."""
    db = _frame_rms_db(wav, frame)
    gain_db = jnp.where(db < thresh_db, (db - thresh_db) * (ratio - 1.0), 0.0)
    gain_db = jnp.maximum(gain_db, -30.0)
    lin = 10.0 ** (gain_db / 20.0)
    lin = jnp.repeat(lin, frame, axis=-1)
    lin = fix_length(lin, wav.shape[-1])
    lin = jnp.where(lin == 0, 1.0, lin)
    return wav * lin


@functools.partial(jax.jit, static_argnames=("limit", "frame"))
def limiter(wav: jnp.ndarray, limit: float = 0.3, frame: int = 64) -> jnp.ndarray:
    t = wav.shape[-1] - wav.shape[-1] % frame
    x = wav[..., :t].reshape(wav.shape[:-1] + (t // frame, frame))
    peak = jnp.max(jnp.abs(x), axis=-1)
    g = jnp.minimum(1.0, limit / (peak + 1e-9))
    g = jnp.repeat(g, frame, axis=-1)
    g = fix_length(g, wav.shape[-1])
    g = jnp.where(g == 0, 1.0, g)
    return wav * g


@functools.partial(jax.jit, static_argnames=("phase",))
def phase_shift(wav: jnp.ndarray, phase: float = float(np.pi / 2)) -> jnp.ndarray:
    """Constant spectral phase rotation (Hilbert-based all-pass).

    The FFT is zero-padded to a power of two: XLA lowers large non-pow2
    lengths to a dense DFT matmul on TPU (a 2 s 44.1 kHz clip produced an
    f32[88200,88200] = 31 GB allocation, ADVICE r3).  The rotation is
    per-bin constant, so the pad only leaks negligible tail energy into
    the cropped region."""
    t = wav.shape[-1]
    nfft = 1 << (t - 1).bit_length()
    spec = jnp.fft.rfft(wav, n=nfft, axis=-1)
    rot = jnp.exp(1j * jnp.asarray(phase, jnp.complex64))
    out = jnp.fft.irfft(spec * rot, n=nfft, axis=-1)[..., :t]
    return out.astype(wav.dtype)


@functools.partial(jax.jit, static_argnames=("max_ms", "sr"))
def time_jitter(wav: jnp.ndarray, key: jax.Array, max_ms: float = 2.0, sr: int = 16_000) -> jnp.ndarray:
    """Smoothly-varying local time warp (± max_ms) with linear-interp gather."""
    t = wav.shape[-1]
    n_ctrl = 32
    ctrl = jax.random.uniform(key, wav.shape[:-1] + (n_ctrl,), minval=-1.0, maxval=1.0)
    offs = jax.image.resize(ctrl, wav.shape[:-1] + (t,), method="linear")
    offs = offs * (max_ms / 1000.0 * sr)
    pos = jnp.clip(jnp.arange(t) + offs, 0.0, t - 1.001)
    # integer clamp: at large T the f32 upper bound t-1.001 rounds UP to
    # t-1 (f32 spacing ~0.008 at 1.2e5), floor then yields t-1 and i0+1
    # gathers out of bounds — jnp's default OOB mode fills NaN for floats
    # (bit half the 24 kHz benchmark clips at 120000 samples)
    i0 = jnp.minimum(jnp.floor(pos).astype(jnp.int32), t - 2)
    frac = jnp.clip(pos - i0, 0.0, 1.0).astype(wav.dtype)
    x0 = jnp.take_along_axis(wav, i0, axis=-1)
    x1 = jnp.take_along_axis(wav, i0 + 1, axis=-1)
    return x0 * (1 - frac) + x1 * frac


@functools.partial(jax.jit, static_argnames=("rate_permyriad",))
def time_stretch(wav: jnp.ndarray, rate_permyriad: int = 9500) -> jnp.ndarray:
    """Speed change by playback-rate warping (the reference's speed attack,
    ``pgd_research/src/misc/attack_baselines.py`` 24k->22.8k->24k).  Rate in
    1/10000 units: the benchmark suite's anchored severity is a 0.01%
    stretch (rate 9999), which already fully desynchronizes fixed-lattice
    detectors over multi-second clips.

    Implemented as a linear-interpolation gather, NOT the polyphase
    resampler: near-unity rates make gcd(10000, rate) tiny, so the
    filterbank would carry orig/gcd phases (rate 9999 -> a 9999x10014
    kernel constant whose serialized MLIR exceeds the remote-compile
    request limit, ADVICE r3).  For |1-rate| <= 5% the interp error is far
    below the anchored severity."""
    t = wav.shape[-1]
    step = 10_000.0 / float(rate_permyriad)  # input samples per output sample
    # positions in float64 ON HOST (t and rate are jit-static): the f32 grid
    # spacing at t ~ 1.2e5 (~0.008 samples) would quantize interpolation
    # positions near the clip tail (ADVICE r4); host numpy keeps sub-sample
    # accuracy at any benchmark length and bakes exact constants into the
    # compiled program
    pos_np = np.arange(t, dtype=np.float64) * step
    valid = jnp.asarray(pos_np <= (t - 1))
    pos_np = np.clip(pos_np, 0.0, t - 1)
    i0_np = np.minimum(np.floor(pos_np), t - 2).astype(np.int32)
    i0 = jnp.asarray(i0_np)
    frac = jnp.asarray(np.clip(pos_np - i0_np, 0.0, 1.0).astype(np.float32)).astype(wav.dtype)
    x0 = wav[..., i0]
    x1 = wav[..., i0 + 1]
    y = x0 * (1 - frac) + x1 * frac
    # samples past the (shorter) stretched signal are silence, matching the
    # previous resample + fix_length(pad) behavior
    return jnp.where(valid, y, jnp.zeros_like(y))


@functools.partial(jax.jit, static_argnames=("rt60_ms", "sr", "wet"))
def reverb(wav: jnp.ndarray, key: jax.Array, rt60_ms: float = 300.0, sr: int = 16_000, wet: float = 0.4) -> jnp.ndarray:
    """Synthetic exponentially-decaying-noise RIR, FFT convolution."""
    n_ir = int(sr * rt60_ms / 1000.0)
    tau = rt60_ms / 1000.0 / 6.9  # RT60 = time to -60 dB
    tt = jnp.arange(n_ir) / sr
    ir = jax.random.normal(key, (n_ir,)) * jnp.exp(-tt / tau)
    ir = ir / (jnp.linalg.norm(ir) + 1e-9)
    n = wav.shape[-1] + n_ir - 1
    nfft = 1 << int(np.ceil(np.log2(max(n, 2))))
    out = jnp.fft.irfft(
        jnp.fft.rfft(wav, n=nfft, axis=-1) * jnp.fft.rfft(ir, n=nfft), n=nfft, axis=-1
    )[..., : wav.shape[-1]]
    return (1.0 - wet) * wav + wet * out.astype(wav.dtype)


@functools.partial(jax.jit, static_argnames=("sr", "bandwidth_hz", "step_db"))
def lossy_codec_surrogate(
    wav: jnp.ndarray, sr: int = 16_000, bandwidth_hz: float = 7000.0, step_db: float = 1.5
) -> jnp.ndarray:
    """Perceptual-codec SURROGATE for mp3/aac/vorbis (no FFmpeg on-device):
    band-limit + masked log-magnitude quantization + sub-masking-floor
    truncation.  Behavioral stand-in, NOT a bit-exact codec."""
    cfg = StftConfig(1024, 256, 1024)
    spec = stft(wav, cfg)
    mag = jnp.abs(spec)
    phase = spec / (mag + 1e-9)
    n_bins = mag.shape[-1]
    freqs = jnp.linspace(0, sr / 2, n_bins)
    band = (freqs <= bandwidth_hz).astype(mag.dtype)
    logmag = jnp.log10(mag + 1e-9) * 20.0
    step = step_db * (1.0 + 2.0 * (freqs / (sr / 2)))  # coarser at high freq
    q = jnp.round(logmag / step) * step
    # masking floor: drop components 40 dB below the local spectral peak
    local_max = jnp.max(logmag, axis=-1, keepdims=True)
    keep = (logmag > local_max - 40.0).astype(mag.dtype)
    mag_q = 10.0 ** (q / 20.0) * keep * band
    return istft(mag_q * phase, cfg, length=wav.shape[-1])


# Severity calibrated against the reference's published per-attack
# sisnr_attack anchors (audioseal/wavmark/silentcipher stats_by_attack.csv,
# loose split): mp3 30.5-31.7 dB, vorbis 19.6-21.3 dB, aac ~-30 dB (the real
# AAC encoder's codec delay time-shifts the waveform, which destroys SI-SNR
# while leaving shift-tolerant detection mostly intact).  Measured surrogate
# severities on 16 LibriSpeech clips: see docs/surrogates.md.


def mp3(wav: jnp.ndarray, sr: int = 16_000) -> jnp.ndarray:
    return lossy_codec_surrogate(wav, sr, bandwidth_hz=0.8 * sr / 2, step_db=0.5)


def aac(wav: jnp.ndarray, sr: int = 16_000) -> jnp.ndarray:
    # encoder delay time-shift is the dominant artifact in the reference's
    # aac rows (sisnr_attack ~ -29 dB); ~30 ms lands the measured surrogate
    # on that anchor (scripts/scratch/cal2.py)
    delay = int(round(0.030 * sr))
    y = lossy_codec_surrogate(wav, sr, bandwidth_hz=0.9 * sr / 2, step_db=1.0)
    return jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(delay, 0)])[..., : wav.shape[-1]]


@functools.partial(jax.jit, static_argnames=("sr", "bandwidth_hz", "step_db"))
def vorbis(
    wav: jnp.ndarray, key: jax.Array | None = None, sr: int = 16_000,
    bandwidth_hz: float | None = None, step_db: float = 4.5,
) -> jnp.ndarray:
    """Vorbis surrogate with SUBTRACTIVELY DITHERED quantization.

    Round-4 analysis (docs/roadmap.md): the deterministic `round` in
    `lossy_codec_surrogate` produces signal-CORRELATED spectral error that
    biases correlation detectors, so the surrogate damaged payloads far more
    than real Vorbis at equal SI-SNR (bitwise 0.67 vs the reference's 0.99
    vorbis row).  Real Vorbis noise-fills: quantization error behaves like
    independent noise.  Subtractive dither ((round(x/Δ+u)−u)·Δ, u~U(-½,½))
    reproduces exactly that — error uniform, white, independent of the
    signal — at the SAME error power as the deterministic rounder, so the
    sisnr_attack anchor (19.6–21.3 dB, stats_by_attack.csv vorbis rows) is
    unchanged while payload correlations survive like they do under the
    real codec."""
    if bandwidth_hz is None:
        bandwidth_hz = 0.85 * sr / 2
    if key is None:
        key = jax.random.PRNGKey(0)
    cfg = StftConfig(1024, 256, 1024)
    spec = stft(wav, cfg)
    mag = jnp.abs(spec)
    phase = spec / (mag + 1e-9)
    n_bins = mag.shape[-1]
    freqs = jnp.linspace(0, sr / 2, n_bins)
    band = (freqs <= bandwidth_hz).astype(mag.dtype)
    logmag = jnp.log10(mag + 1e-9) * 20.0
    step = step_db * (1.0 + 2.0 * (freqs / (sr / 2)))
    u = jax.random.uniform(key, logmag.shape, minval=-0.5, maxval=0.5)
    q = (jnp.round(logmag / step + u) - u) * step
    local_max = jnp.max(logmag, axis=-1, keepdims=True)
    keep = (logmag > local_max - 40.0).astype(mag.dtype)
    mag_q = 10.0 ** (q / 20.0) * keep * band
    return istft(mag_q * phase, cfg, length=wav.shape[-1])
