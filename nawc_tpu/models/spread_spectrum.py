"""Designed (training-free) spread-spectrum watermark: 16-bit payload as
pseudo-noise magnitude modulation in the STFT band, matched-filter detection.

Capability analogue of the reference's additive AudioSeal wrapper (16-bit
payload, additive watermark at 16 kHz, presence prob + bits out,
``watermark_testing.py:83-111``) but with a closed-form detector, so the
framework has a high-bit-accuracy embed/detect path that needs no pretrained
weights.  Everything is one jitted graph: stft -> modulate -> istft (+
compensation passes) on embed; stft -> whiten -> correlate on detect.

Scheme
------
Key -> n_bits ±1 PN patterns p_b[t, f] over (time, band), piecewise-constant
over 4-frame x 4-bin cells (modulation finer than the overlap-add smear
radius would be averaged away by resynthesis), tiled from a period-64 block.
Spreading over BOTH axes buys detection SNR: stationary spectral structure
(harmonic combs) is orthogonal to a time-varying PN, while the watermark
accumulates over all T*F samples.

Embed:  |X'(t,f)| = |X(t,f)| * (1 + alpha * m[t,f]),
        m = sum_b s_b p_b / sqrt(n_bits), s_b = +-1 the payload; phase kept.
        `n_passes-1` compensation passes re-apply whatever modulation the
        overlap-add resynthesis lost (survival ~0.55 single-pass -> ~0.75).
Detect: r(t,f) = log|X| - freq-smoothed log|X| (envelope removal), whitened
        per-bin by its time statistics; corr_b = <r, p_b>.  The statistic is
        self-calibrating: sigma is estimated from correlations with
        time-rolled (watermark-orthogonal) patterns, so z_b = corr_b / sigma
        is ~N(0,1) on unmarked audio regardless of content.  bit = sign(z_b);
        presence = sigmoid(g * (mean_b |z_b| - z0)).

Measured on 24 LibriSpeech clips (2 s @16 kHz): clean-channel BER 0.26%,
SI-SNR ~22 dB, unmarked max |z| 3.5 over 384 null bits.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..dsp.stft import stft, istft
from ..ops.sswm import whiten_correlate
from ..utils.config import SpreadSpectrumConfig, StftConfig
from .base import register

_PN_PERIOD = 64  # frames per PN tile
_TIME_CELL = 4  # frames per PN chip (overlap-add smear: win/hop = 4)
_FREQ_CELL = 4  # bins per PN chip (Hann main lobe spans ~4 bins)
_NULL_OFFSETS = (17, 23, 29, 37, 47, 53)  # frame rolls for null calibration


def _band_slice(cfg: SpreadSpectrumConfig) -> tuple[int, int]:
    n_bins = cfg.n_fft // 2 + 1
    lo = int(round(cfg.band_lo_hz / (cfg.sample_rate / 2) * (n_bins - 1)))
    hi = int(round(cfg.band_hi_hz / (cfg.sample_rate / 2) * (n_bins - 1)))
    return lo, max(hi, lo + 8)


def _pn_patterns(key: jax.Array, cfg: SpreadSpectrumConfig) -> jnp.ndarray:
    """(n_bits, P, band_width) ±1 TF patterns, piecewise-constant over
    (_TIME_CELL x _FREQ_CELL) cells, derived from the secret key.

    Prefix-stable: bit b's pattern comes from fold_in(key, b), so a probe
    with more bits shares the leading patterns — the psychoacoustic
    watermark's message-length discovery depends on this."""
    lo, hi = _band_slice(cfg)
    width = hi - lo
    tc = _PN_PERIOD // _TIME_CELL
    fc = -(-width // _FREQ_CELL)

    def one(b):
        return jax.random.bernoulli(jax.random.fold_in(key, b), 0.5, (tc, fc))

    bits = jax.vmap(one)(jnp.arange(cfg.n_bits))
    p = 2.0 * bits.astype(jnp.float32) - 1.0
    p = jnp.repeat(jnp.repeat(p, _TIME_CELL, axis=1), _FREQ_CELL, axis=2)
    return p[:, :, :width]


def _tile_patterns(p: jnp.ndarray, t: int) -> jnp.ndarray:
    """(n_bits, P, W) -> (n_bits, t, W) by tiling the period along time."""
    reps = -(-t // _PN_PERIOD)
    return jnp.tile(p, (1, reps, 1))[:, :t]


def _level_mask(band_logmag: jnp.ndarray, cfg: SpreadSpectrumConfig) -> jnp.ndarray:
    """(…, T, W) band log-magnitude -> soft mask in (0, 1] sparing the
    loudest bins (see SpreadSpectrumConfig.mask_quantile).  Computed from
    whatever audio is at hand — embed uses the clean spectrum, detect the
    received one; the per-clip quantile makes it level-invariant, so both
    sides agree on (almost) the same cells without sharing state."""
    if cfg.mask_quantile <= 0.0 and cfg.mask_lo_quantile <= 0.0:
        return jnp.ones_like(band_logmag)
    flat = band_logmag.reshape(band_logmag.shape[:-2] + (-1,))
    w = jnp.ones_like(band_logmag)
    if cfg.mask_quantile > 0.0:
        tau = jnp.quantile(flat, cfg.mask_quantile, axis=-1)[..., None, None]
        w = w * jax.nn.sigmoid((tau - band_logmag) / cfg.mask_softness)
    if cfg.mask_lo_quantile > 0.0:
        tau_lo = jnp.quantile(flat, cfg.mask_lo_quantile, axis=-1)[..., None, None]
        w = w * jax.nn.sigmoid((band_logmag - tau_lo) / cfg.mask_softness)
    return w


def _freq_smooth(logmag: jnp.ndarray, width: int = 15) -> jnp.ndarray:
    """Moving-average over the frequency axis (spectral envelope estimate)."""
    kernel = jnp.ones((width,), logmag.dtype) / width
    pad = width // 2
    x = jnp.pad(logmag, [(0, 0)] * (logmag.ndim - 1) + [(pad, pad)], mode="edge")
    lead = x.shape[:-1]
    flat = x.reshape((-1, 1, x.shape[-1]))
    out = jax.lax.conv_general_dilated(
        flat, kernel.reshape(1, 1, -1), (1,), "VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out.reshape(lead + (out.shape[-1],))


@dataclasses.dataclass(frozen=True)
class SpreadSpectrumWM:
    """See module docstring.  `seed` fixes the secret key."""

    # alpha 0.18 + level-adaptive mask sparing the loudest 15% of band bins:
    # SI-SNR 36.7 dB (was 21.8 unmasked at alpha 0.1) with bit_clean 1.000,
    # sigma=1e-3 additive-noise bits 0.961 and 20-attack survival ~0.99 on the
    # 8x2s LibriSpeech fixture (scripts/scratch/tune_impercept_r3.py sweep).
    # The masked energy sits in quieter bins, so alpha must rise vs the
    # unmasked operating point to keep the additive-noise margin; 0.18 is the
    # largest-SI point that still clears the >=0.95 noise bit-accuracy bar
    # while staying above the reference WavMark band (BASELINE §6.1: 36.2 dB).
    cfg: SpreadSpectrumConfig = SpreadSpectrumConfig(alpha=0.18, mask_quantile=0.85)
    seed: int = 0
    n_passes: int = 2
    name: str = "spread_spectrum"
    presence_z0: float = 1.3
    presence_gain: float = 4.0
    score_z0: float = 0.8
    score_gain: float = 3.0

    @property
    def sample_rate(self) -> int:
        return self.cfg.sample_rate

    @property
    def n_bits(self) -> int:
        return self.cfg.n_bits

    @property
    def stft_cfg(self) -> StftConfig:
        return StftConfig(self.cfg.n_fft, self.cfg.hop, self.cfg.n_fft)

    def _patterns(self) -> jnp.ndarray:
        return _pn_patterns(jax.random.PRNGKey(self.seed), self.cfg)

    # -- embed -------------------------------------------------------------
    @functools.partial(jax.jit, static_argnames=("self",))
    def embed(self, wav: jnp.ndarray, msg: jnp.ndarray, key: jax.Array | None = None) -> jnp.ndarray:
        cfg = self.cfg
        lo, hi = _band_slice(cfg)
        spec_clean = stft(wav, self.stft_cfg)  # (B, T', F)
        t = spec_clean.shape[-2]
        p = _tile_patterns(self._patterns(), t)  # (n_bits, T', W)
        s = 2.0 * msg.astype(jnp.float32) - 1.0  # (B, n_bits)
        mod = jnp.einsum("bk,ktw->btw", s, p) / jnp.sqrt(float(cfg.n_bits))
        want = cfg.alpha * jnp.clip(mod, -3.0, 3.0)  # target log-mag delta
        log_clean = jnp.log(jnp.abs(spec_clean) + 1e-6)
        want = want * _level_mask(log_clean[..., lo:hi], cfg)

        gain = jnp.ones_like(spec_clean.real).at[..., lo:hi].add(want)
        marked = istft(spec_clean * gain, self.stft_cfg, length=wav.shape[-1])
        for _ in range(self.n_passes - 1):
            # re-apply the modulation the overlap-add resynthesis lost
            sm = stft(marked, self.stft_cfg)
            delta = jnp.log(jnp.abs(sm) + 1e-6) - log_clean
            fix = jnp.clip(want - delta[..., lo:hi], -0.5, 0.5)
            gain = jnp.ones_like(sm.real).at[..., lo:hi].add(fix)
            marked = istft(sm * gain, self.stft_cfg, length=wav.shape[-1])
        return jnp.clip(marked, -1.0, 1.0)

    # -- detect ------------------------------------------------------------
    def _correlate(self, wav: jnp.ndarray) -> jnp.ndarray:
        """(B, T) -> (B, n_bits) self-calibrated statistics z_b
        (~N(0,1) on unmarked audio).

        Per-bin whitening over time equalizes bin reliability and kills
        stationary structure (harmonic combs); rolled-pattern correlations
        sample the clip's own null distribution for the sigma estimate.
        The whiten+correlate+null pass is the detect hot path and runs as
        one fused Pallas kernel on TPU (``ops/sswm.py``)."""
        lo, hi = _band_slice(self.cfg)
        spec = stft(wav, self.stft_cfg)
        t = spec.shape[-2]
        p = _tile_patterns(self._patterns(), t)  # (n_bits, T', W)
        logmag = jnp.log(jnp.abs(spec) + 1e-6)
        r = (logmag - _freq_smooth(logmag))[..., lo:hi]  # (B, T', W)
        # matched weighting: the embed spared the loudest bins, so they
        # carry no signal — down-weight them instead of letting them dilute
        r = r * _level_mask(logmag[..., lo:hi], self.cfg)
        return whiten_correlate(r, p, _NULL_OFFSETS)

    @functools.partial(jax.jit, static_argnames=("self",))
    def detect(self, wav: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        z = self._correlate(wav)
        bits = (z > 0).astype(jnp.int32)
        presence = jax.nn.sigmoid(
            self.presence_gain * (jnp.mean(jnp.abs(z), axis=-1) - self.presence_z0)
        )
        return presence, bits

    # -- synchronization search -------------------------------------------
    def _whitened_residual(self, wav: jnp.ndarray) -> jnp.ndarray:
        lo, hi = _band_slice(self.cfg)
        spec = stft(wav, self.stft_cfg)
        logmag = jnp.log(jnp.abs(spec) + 1e-6)
        r = (logmag - _freq_smooth(logmag))[..., lo:hi]
        r = r * _level_mask(logmag[..., lo:hi], self.cfg)
        mu = jnp.mean(r, axis=-2, keepdims=True)
        sd = jnp.std(r, axis=-2, keepdims=True)
        r = (r - mu) / (sd + 0.2)
        return r - jnp.mean(r, axis=(-2, -1), keepdims=True)

    def _correlate_all_lags(self, wav: jnp.ndarray) -> jnp.ndarray:
        """(B, T) -> (B, n_bits, L) correlation statistics at every cyclic
        frame lag, via FFT cross-correlation along time.  The lag axis
        doubles as the null distribution: true-lag peaks stand on an ocean
        of watermark-orthogonal lags, so sigma is estimated per clip from
        the median absolute correlation over lags (robust to the peak)."""
        r = self._whitened_residual(wav)  # (B, T', W)
        t = r.shape[-2]
        p = _tile_patterns(self._patterns(), t)  # (K, T', W)
        p = p - jnp.mean(p, axis=-2, keepdims=True)
        rf = jnp.fft.rfft(r, axis=-2)  # (B, F, W)
        pf = jnp.fft.rfft(p, axis=-2)  # (K, F, W)
        cross = jnp.einsum("bfw,kfw->bkf", rf, jnp.conj(pf))
        c = jnp.fft.irfft(cross, n=t, axis=-1)  # (B, K, L)
        sigma = 1.4826 * jnp.median(jnp.abs(c), axis=(-2, -1), keepdims=True)
        return c / (sigma + 1e-8)

    @functools.partial(jax.jit, static_argnames=("self", "max_lag"))
    def detect_sync(
        self, wav: jnp.ndarray, max_lag: int | None = None
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Shift-robust detection: search frame lags, decode at the best.

        Returns (presence, bits, best_lag_frames).  `max_lag` restricts the
        search window (None = all cyclic lags).  The presence gate sits
        higher than plain detect's (selection over L lags inflates the max
        under H0 by ~sqrt(2 ln L))."""
        z = self._correlate_all_lags(wav)  # (B, K, L)
        if max_lag is not None:
            z = z[..., : max_lag + 1]
        strength = jnp.mean(jnp.abs(z), axis=-2)  # (B, L)
        best = jnp.argmax(strength, axis=-1)  # (B,)
        z_best = jnp.take_along_axis(z, best[:, None, None], axis=-1)[..., 0]
        bits = (z_best > 0).astype(jnp.int32)
        l = z.shape[-1]
        # empirical calibration on LibriSpeech: marked mean|z_best| 1.9-2.9,
        # unmarked 1.1-1.3 at L~125 lags -> gate at ~1.6, steeper sigmoid
        z0 = self.presence_z0 + 0.1 * jnp.sqrt(2.0 * jnp.log(float(max(l, 2))))
        presence = jax.nn.sigmoid(
            6.0 * (jnp.mean(jnp.abs(z_best), axis=-1) - z0)
        )
        return presence, bits, best

    @functools.partial(jax.jit, static_argnames=("self",))
    def score(self, wav: jnp.ndarray, msg: jnp.ndarray | None = None) -> jnp.ndarray:
        """AudioSeal-semantic score: presence prob; with a known payload the
        signed correlation is used (more sensitive)."""
        z = self._correlate(wav)
        if msg is None:
            return jax.nn.sigmoid(
                self.presence_gain * (jnp.mean(jnp.abs(z), axis=-1) - self.presence_z0)
            )
        s = 2.0 * msg.astype(jnp.float32) - 1.0
        return jax.nn.sigmoid(
            self.score_gain * (jnp.mean(z * s, axis=-1) - self.score_z0)
        )


@register("spread_spectrum")
def _build(cfg: SpreadSpectrumConfig | None = None, seed: int = 0) -> SpreadSpectrumWM:
    return SpreadSpectrumWM(cfg=cfg, seed=seed) if cfg is not None else SpreadSpectrumWM(seed=seed)
