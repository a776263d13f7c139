"""Trainable neural additive watermark: generator + frame-wise detector
(AudioSeal-capability analogue).

The reference wraps the pretrained ``audioseal`` pip package: additive
watermark from a generator at 16 kHz, detector returning (B, 2+nbits, T)
frame logits with presence = mean class-1 prob
(``watermark_testing.py:94-111``, ``pgd_research/src/misc/attack_test.py:
85-95``).  We cannot ship Meta's weights, so the TPU framework provides the
same architecture shape as trainable Flax modules + a joint training step
(train/wm_train.py): conv encoder -> bottleneck + message embedding ->
conv decoder -> additive delta; detector = conv encoder -> upsample ->
per-sample (2 + n_bits) logits.  NWC layout, SAME padding, fully jittable.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..codec.layers import Snake
from ..utils.config import NeuralWMConfig
from .base import register


class _ConvBlock(nn.Module):
    dim: int
    stride: int

    @nn.compact
    def __call__(self, x):
        x = Snake()(x)
        x = nn.Conv(self.dim, (2 * self.stride,), strides=(self.stride,), padding="SAME")(x)
        return x


class _DeconvBlock(nn.Module):
    dim: int
    stride: int

    @nn.compact
    def __call__(self, x):
        x = Snake()(x)
        x = nn.ConvTranspose(self.dim, (2 * self.stride,), strides=(self.stride,), padding="SAME")(x)
        return x


class WMGenerator(nn.Module):
    """(wav (B, T), msg (B, n_bits)) -> additive delta (B, T)."""

    cfg: NeuralWMConfig

    @nn.compact
    def __call__(self, wav: jnp.ndarray, msg: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        h = wav[..., None]
        h = nn.Conv(cfg.dim, (7,), padding="SAME")(h)
        dim = cfg.dim
        for s in cfg.strides:
            dim *= 2
            h = _ConvBlock(dim, s)(h)
        h = nn.Conv(cfg.bottleneck_dim, (3,), padding="SAME")(h)
        # AudioSeal-style message embedding: one embedding per (bit, value),
        # summed and broadcast over time
        emb = self.param(
            "msg_embedding",
            nn.initializers.normal(0.02),
            (cfg.n_bits, 2, cfg.bottleneck_dim),
        )
        idx = msg.astype(jnp.int32)  # (B, n_bits) in {0,1}
        msg_vec = jnp.sum(jnp.take_along_axis(emb[None], idx[:, :, None, None], axis=2)[:, :, 0], axis=1)
        h = h + msg_vec[:, None, :]
        for s in reversed(cfg.strides):
            dim //= 2
            h = _DeconvBlock(dim, s)(h)
        h = Snake()(h)
        # zero-init output: watermark starts silent (see codec Decoder note)
        delta = nn.Conv(1, (7,), padding="SAME", kernel_init=nn.initializers.zeros)(h)[..., 0]
        return delta[:, : wav.shape[-1]]


class WMDetector(nn.Module):
    """wav (B, T) -> per-sample logits (B, T, 2 + n_bits).

    Channel 0:2 = absent/present classification (softmax), 2: = bit logits —
    the reference's detector output layout (``attack_test.py:85-95``)."""

    cfg: NeuralWMConfig

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        h = wav[..., None]
        h = nn.Conv(cfg.dim, (7,), padding="SAME")(h)
        dim = cfg.dim
        total = 1
        for s in cfg.strides:
            dim *= 2
            total *= s
            h = _ConvBlock(dim, s)(h)
        h = Snake()(h)
        h = nn.Conv(cfg.bottleneck_dim, (3,), padding="SAME")(h)
        # upsample back to sample rate (repeat + refine)
        h = jnp.repeat(h, total, axis=1)[:, : wav.shape[-1]]
        h = nn.Conv(cfg.bottleneck_dim // 2, (7,), padding="SAME")(h)
        h = Snake()(h)
        return nn.Conv(2 + cfg.n_bits, (3,), padding="SAME")(h)


def presence_prob(logits: jnp.ndarray) -> jnp.ndarray:
    """(B, T, 2+n) -> (B,) mean class-1 probability (reference semantic)."""
    return jax.nn.softmax(logits[..., :2], axis=-1)[..., 1].mean(axis=-1)


def decode_bits(logits: jnp.ndarray) -> jnp.ndarray:
    """(B, T, 2+n) -> (B, n) hard bits from time-averaged logits."""
    return (logits[..., 2:].mean(axis=-2) > 0).astype(jnp.int32)


@dataclasses.dataclass(frozen=True)
class NeuralWM:
    """Watermarker API wrapper over trained generator/detector params.

    Embed/detect run on windows of ``cfg.window`` samples (the training
    length).  The generator's message pattern lives on its downsample
    lattice (stride product 320): a detector read that is misaligned with
    the embed lattice decodes bits at chance, so both sides chunk the
    stream at the same window boundary (measured: aligned windows decode
    1.00, offsets != 0 mod 320 decode ~0.5; see tests/test_neural_wm.py).
    Presence is lattice-free and averages over everything."""

    cfg: NeuralWMConfig
    gen_params: Any
    det_params: Any
    name: str = "neural"

    @property
    def sample_rate(self) -> int:
        return self.cfg.sample_rate

    @property
    def n_bits(self) -> int:
        return self.cfg.n_bits

    def _chunk(self, wav: jnp.ndarray) -> tuple[jnp.ndarray, int]:
        """(B, T) -> (B * nc, W) zero-padded windows."""
        b, t = wav.shape
        w = self.cfg.window
        nc = max(1, -(-t // w))
        wav = jnp.pad(wav, ((0, 0), (0, nc * w - t)))
        return wav.reshape(b * nc, w), nc

    def embed(self, wav: jnp.ndarray, msg: jnp.ndarray, key=None) -> jnp.ndarray:
        b, t = wav.shape
        x, nc = self._chunk(wav)
        msg_c = jnp.repeat(msg, nc, axis=0)
        delta = WMGenerator(self.cfg).apply(self.gen_params, x, msg_c)
        marked = jnp.clip(x + self.cfg.alpha * delta, -1.0, 1.0)
        return marked.reshape(b, nc * self.cfg.window)[:, :t]

    def logits(self, wav: jnp.ndarray) -> jnp.ndarray:
        """Whole-input detector logits (B, T, 2+n) — lattice-anchored at 0;
        the differentiable PGD surface and the presence path."""
        return WMDetector(self.cfg).apply(self.det_params, wav)

    def detect(self, wav: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Polarity-invariant detect: the additive delta flips sign with the
        waveform (a polarity attack is exactly `-marked`), so the detector
        logits flip too and bits would decode inverted.  Both polarities run
        as one doubled batch and each clip keeps the sign with the higher
        presence probability — standard practice for sign-ambiguous
        channels; measured: polarity bitwise 0.53 -> parity with clean."""
        pres_p, bits_p, _ = self._detect_one(wav)
        pres_n, bits_n, _ = self._detect_one(-wav)
        use_n = (pres_n > pres_p)
        pres = jnp.where(use_n, pres_n, pres_p)
        bits = jnp.where(use_n[:, None], bits_n, bits_p)
        return pres, bits

    def _detect_one(self, wav: jnp.ndarray):
        b, t = wav.shape
        x, nc = self._chunk(wav)
        lg = WMDetector(self.cfg).apply(self.det_params, x)  # (b*nc, W, 2+n)
        # mask padding so silence in the final window doesn't vote
        idx = jnp.arange(nc * self.cfg.window)[None, :]
        valid = (idx < t).reshape(1, nc, self.cfg.window).reshape(nc, -1)
        valid = jnp.tile(valid, (b, 1))[..., None]  # (b*nc, W, 1)
        lg = lg * valid
        n_valid = jnp.maximum(valid.sum(axis=(1, 2)), 1.0)[:, None]
        pres = jax.nn.softmax(lg[..., :2], axis=-1)[..., 1]
        pres = (pres * valid[..., 0]).reshape(b, -1).sum(-1) / jnp.maximum(
            valid[..., 0].reshape(b, -1).sum(-1), 1.0)
        # per-window mean bit logits, summed over windows (soft majority)
        bl = lg[..., 2:].sum(axis=-2) / n_valid  # (b*nc, n)
        bl_sum = bl.reshape(b, nc, -1).sum(axis=1)
        bits = (bl_sum > 0).astype(jnp.int32)
        return pres, bits, bl_sum

    def score(self, wav: jnp.ndarray, msg: jnp.ndarray | None = None) -> jnp.ndarray:
        """AudioSeal semantic: mean presence prob (``watermark_testing.py:
        106-111``); differentiable (PGD target)."""
        return presence_prob(self.logits(wav))

    def detect_sync(self, wav: jnp.ndarray, step: int = 8, group: int = 4):
        """Shift-robust detect: search the generator's stride-lattice phase.

        The bit pattern lives on the 320-sample stride lattice; a constant
        delay like the AAC encoder's ~30 ms desyncs bit decode to chance
        while presence stays ~1.0.  Measured alignment tolerance (CPU probe,
        round 5): residuals up to ±4 samples decode 1.00 — but ONLY at
        matching parity (the stride-2 first conv makes any odd net shift
        read at chance, e.g. exact-undo±1 fails while exact-undo±4 passes).
        The candidate grid is therefore BOTH parities stepped by `step`
        within each ({0,1,8,9,16,17,…}), × both polarities (the additive
        delta flips sign with the waveform) = 160 candidates, max residual
        ±4 at true parity.

        Stage 1 scans candidates on the FIRST window only, scoring by mean
        |pooled bit logit| (decode confidence peaks at the true phase;
        verified: a 480-sample flipped delay recovers offset 160, acc 1.00).
        Stage 2 re-runs the full detector once at the per-clip best
        (offset, sign).  Candidates run `group` at a time under lax.map so
        peak activation memory stays ~`group` batches.  Mirrors the
        shift-search design of ``SpreadSpectrumWM.detect_sync``.

        Returns (presence, bits, best_offset_samples)."""
        b, t = wav.shape
        period = 1
        for s in self.cfg.strides:
            period *= s
        offsets = np.sort(np.concatenate([
            np.arange(0, period, step, dtype=np.int32),
            np.arange(1, period, step, dtype=np.int32),
        ]))
        w = self.cfg.window
        prefix = wav[:, :w] if t >= w else jnp.pad(wav, ((0, 0), (0, w - t)))
        cand_off = np.concatenate([offsets] * 2)
        cand_sign = np.concatenate([
            np.ones(len(offsets), np.float32), -np.ones(len(offsets), np.float32)])
        # pad candidate list to a multiple of `group` by repeating offset 0
        c = len(cand_off)
        pad = (-c) % group
        cand_off = jnp.asarray(np.concatenate([cand_off, np.zeros(pad, np.int32)]))
        cand_sign = jnp.asarray(np.concatenate([cand_sign, np.ones(pad, np.float32)]))

        det = WMDetector(self.cfg)

        def conf_group(cands):
            off, sign = cands  # (group,)
            x = jax.vmap(
                lambda o, s: s * jnp.roll(prefix, -o, axis=-1))(off, sign)
            lg = det.apply(self.det_params, x.reshape(-1, w))
            bl = lg[..., 2:].mean(axis=-2).reshape(group, b, -1)
            return jnp.mean(jnp.abs(bl), axis=-1)  # (group, B)

        confs = jax.lax.map(
            conf_group,
            (cand_off.reshape(-1, group), cand_sign.reshape(-1, group)),
        ).reshape(-1, b)[:c]  # (C, B), pad rows dropped
        # Per-sign offset selection with a PEAK-SIGNIFICANCE gate: on
        # heavily attacked audio the bit-confidence scan is noise, and a
        # noise-argmax offset corrupts bits that an offset-0 read would
        # decode (and a noise-chosen SIGN zeroes presence).  Only deviate
        # from offset 0 when the scan shows a clear peak (z >= 3 over the
        # candidate-confidence distribution); presence is the polarity-
        # invariant max over both stage-2 passes, matching plain `detect`.
        half = len(offsets)
        offs = jnp.asarray(offsets)
        mu = jnp.mean(confs, axis=0)
        sd = jnp.std(confs, axis=0) + 1e-9

        def pick(conf_s):  # (half, B) -> gated best offset (B,)
            best = jnp.argmax(conf_s, axis=0)
            peak_z = (jnp.max(conf_s, axis=0) - mu) / sd
            # measured (CPU z-diag, 4 clips x 2 s): true peaks 2.8-4.3,
            # same-sign noise peaks <= 1.0 under lowpass; wrong-sign noise
            # reaches 2.7 but loses the stage-2 presence contest anyway
            return jnp.where(peak_z >= 2.5, offs[best], 0)

        off_p = pick(confs[:half])
        off_n = pick(confs[half:])

        def realign(off):
            idx = (jnp.arange(t)[None, :] + off[:, None]) % t
            return jnp.take_along_axis(wav, idx, axis=-1)

        pres_p, bits_p, _ = self._detect_one(realign(off_p))
        pres_n, bits_n, _ = self._detect_one(-realign(off_n))
        use_n = pres_n > pres_p
        pres = jnp.where(use_n, pres_n, pres_p)
        bits = jnp.where(use_n[:, None], bits_n, bits_p)
        best_off = jnp.where(use_n, off_n, off_p)
        return pres, bits, best_off


def init_neural_wm(key: jax.Array, cfg: NeuralWMConfig = NeuralWMConfig(), example_len: int = 16_000) -> NeuralWM:
    kg, kd = jax.random.split(key)
    wav = jnp.zeros((1, example_len))
    msg = jnp.zeros((1, cfg.n_bits), jnp.int32)
    gen_params = WMGenerator(cfg).init(kg, wav, msg)
    det_params = WMDetector(cfg).init(kd, wav)
    return NeuralWM(cfg, gen_params, det_params)


@register("neural")
def _build(cfg: NeuralWMConfig = NeuralWMConfig(), seed: int = 0) -> NeuralWM:
    return init_neural_wm(jax.random.PRNGKey(seed), cfg)
