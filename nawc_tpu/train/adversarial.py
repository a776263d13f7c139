"""Adversarial (HiFi-GAN-style) fine-tune of the codec DECODER.

New capability vs the reference (which ships pretrained codecs from pip,
SURVEY.md §0).  Round-2 context: the phase-locked codec reaches held-out
SI-SNR +7.7 dB but its texture is over-smoothed (LSD ~18, STOI 0.964 —
VERDICT round 1, weak #6).  Magnitude losses cannot fix texture; a GAN can.

Design choices, TPU-first:
  * DECODER-ONLY gradients.  The encoder, projections and codebooks are the
    host space of the semantic watermarks, the manifold axes, and the
    ablation masks — fine-tuning them would silently move every published
    operating point.  Freezing them (:func:`decoder_only_tx`) makes the
    fine-tune a pure resynthesis upgrade: codes in, better waveform out.
  * Multi-period + multi-scale discriminators (periods 2/3/5/7/11, scales
    x1/x2/x4) with LSGAN losses and feature matching.  All convs are static
    shape; period reshapes are (B, T/p, p) with T padded to lcm(periods,
    scales) ahead of time so every branch jits once.
  * One jitted step runs D-update then G-update (G sees the just-updated D)
    so the whole iteration is a single XLA program — no host round-trips
    between the two updates.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from ..codec.model import SnacCodec
from ..dsp.mel import mel_spectrogram
from ..utils.config import CodecConfig
from .codec_train import MEL_SCALES, multires_stft_loss

PERIODS = (2, 3, 5, 7, 11)
SCALES = (1, 2, 4)
_PAD_MULTIPLE = 4620  # lcm(2, 3, 5, 7, 11, 4): every reshape/pool is exact


class PeriodDiscriminator(nn.Module):
    """Views the waveform as a (T/p, p) image; convs stride over time only,
    so periodic artifacts at lag p line up along the second axis."""

    period: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> tuple[jnp.ndarray, list[jnp.ndarray]]:
        b, t = x.shape
        h = x.reshape(b, t // self.period, self.period, 1)
        feats = []
        for dim in (16, 64, 256, 256):
            h = nn.Conv(dim, (5, 1), strides=(3, 1), padding="SAME")(h)
            h = nn.leaky_relu(h, 0.1)
            feats.append(h)
        h = nn.Conv(1, (3, 1), padding="SAME")(h)
        return h.reshape(b, -1), feats


class ScaleDiscriminator(nn.Module):
    """1-D grouped-conv discriminator over a (possibly average-pooled)
    waveform."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> tuple[jnp.ndarray, list[jnp.ndarray]]:
        h = x[..., None]
        feats = []
        for dim, k, s, g in ((16, 15, 1, 1), (64, 41, 4, 4),
                             (256, 41, 4, 16), (256, 5, 1, 1)):
            h = nn.Conv(dim, (k,), strides=(s,), feature_group_count=g, padding="SAME")(h)
            h = nn.leaky_relu(h, 0.1)
            feats.append(h)
        h = nn.Conv(1, (3,), padding="SAME")(h)
        return h.reshape(x.shape[0], -1), feats


class Discriminators(nn.Module):
    """All MPD + MSD heads; returns per-head (logits, feature list)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[tuple[jnp.ndarray, list[jnp.ndarray]]]:
        outs = []
        for p in PERIODS:
            outs.append(PeriodDiscriminator(p, name=f"mpd_{p}")(x))
        for s in SCALES:
            xs = nn.avg_pool(x[..., None], (s,), (s,), "SAME")[..., 0] if s > 1 else x
            outs.append(ScaleDiscriminator(name=f"msd_{s}")(xs))
        return outs


def pad_for_periods(t: int) -> int:
    """Smallest length >= t divisible by every period view and scale pool."""
    return -(-t // _PAD_MULTIPLE) * _PAD_MULTIPLE


def d_loss_fn(outs_real, outs_fake) -> jnp.ndarray:
    """LSGAN discriminator loss: (D(x)-1)^2 + D(G)^2, averaged over heads."""
    total = 0.0
    for (lr_, _), (lf_, _) in zip(outs_real, outs_fake):
        total = total + jnp.mean((lr_ - 1.0) ** 2) + jnp.mean(lf_**2)
    return total / len(outs_real)


def g_adv_loss_fn(outs_fake) -> jnp.ndarray:
    """LSGAN generator loss: (D(G)-1)^2 averaged over heads."""
    total = 0.0
    for lf_, _ in outs_fake:
        total = total + jnp.mean((lf_ - 1.0) ** 2)
    return total / len(outs_fake)


def feature_match_fn(outs_real, outs_fake) -> jnp.ndarray:
    """L1 between real-input and generated-input conv taps, every head.
    Real taps are targets (no generator grads flow through them anyway)."""
    total, n = 0.0, 0
    for (_, fr), (_, ff) in zip(outs_real, outs_fake):
        for a, b in zip(fr, ff):
            total = total + jnp.mean(jnp.abs(a - b))
            n += 1
    return total / max(n, 1)


def decoder_only_mask(params) -> Any:
    """True for decoder leaves, False elsewhere (encoder/quantizer frozen —
    the semantic-watermark host space must not move)."""
    def mark(path, _):
        return any(getattr(p, "key", None) == "decoder" for p in path)

    return jax.tree_util.tree_map_with_path(mark, params)


def decoder_only_tx(inner, params):
    """Wrap ``inner`` so only decoder leaves are updated; everything else
    gets an exactly-zero update.

    ``optax.masked(inner, mask)`` is NOT safe for freezing: it applies
    ``inner`` to masked leaves but passes the *raw incoming gradients*
    through unchanged for unmasked ones, and ``optax.apply_updates`` then
    ADDS those gradients to the "frozen" parameters — a full-gradient
    ascent step that destroys a trained encoder in one iteration (the
    round-3 GAN NaN).  ``multi_transform`` + ``set_to_zero`` pins frozen
    updates to 0.
    """
    import optax as _optax

    labels = jax.tree_util.tree_map(
        lambda m: "train" if m else "freeze", decoder_only_mask(params))
    return _optax.multi_transform(
        {"train": inner, "freeze": _optax.set_to_zero()}, labels)


def init_discriminators(key: jax.Array, example_len: int) -> Any:
    x = jnp.zeros((1, pad_for_periods(example_len)), jnp.float32)
    return Discriminators().init(key, x)


def recon_losses(cfg: CodecConfig, wav: jnp.ndarray, recon: jnp.ndarray,
                 sisnr_weight: float) -> tuple[jnp.ndarray, dict]:
    """The decoder-relevant subset of codec_train.codec_loss (commit/codebook
    terms are constants under frozen encoder+quantizer)."""
    l1 = jnp.mean(jnp.abs(recon - wav))
    mel_l = 0.0
    for stft_cfg, mel_cfg in MEL_SCALES:
        mc = dataclasses.replace(mel_cfg, sample_rate=cfg.sample_rate)
        mel_l = mel_l + jnp.mean(jnp.abs(
            mel_spectrogram(wav, stft_cfg, mc, log=True)
            - mel_spectrogram(recon, stft_cfg, mc, log=True)))
    mel_l = mel_l / len(MEL_SCALES)
    stft_l = multires_stft_loss(wav, recon)
    ref = wav - wav.mean(axis=-1, keepdims=True)
    est = recon - recon.mean(axis=-1, keepdims=True)
    dot = jnp.sum(ref * est, -1, keepdims=True)
    proj = dot / (jnp.sum(ref * ref, -1, keepdims=True) + 1e-8) * ref
    sisnr = 10 * jnp.log10(
        (jnp.sum(proj**2, -1) + 1e-8) / (jnp.sum((est - proj) ** 2, -1) + 1e-8)
    ).mean()
    loss = l1 + mel_l + stft_l - sisnr_weight * sisnr
    return loss, {"l1": l1, "mel": mel_l, "stft": stft_l, "si_snr": sisnr}


def make_gan_train_step(
    cfg: CodecConfig,
    gtx,
    dtx,
    sisnr_weight: float = 0.05,
    adv_weight: float = 1.0,
    fm_weight: float = 2.0,
):
    """Returns jitted step(gen_params, disc_params, g_opt, d_opt, wav)
    -> (gen_params, disc_params, g_opt, d_opt, metrics).

    ``gtx`` should be built with :func:`decoder_only_tx` so encoder and
    quantizer updates are pinned to exactly zero (NOT ``optax.masked`` —
    see :func:`decoder_only_tx` for why that silently un-freezes)."""

    disc = Discriminators()

    def step(gen_params, disc_params, g_opt, d_opt, wav):
        tpad = pad_for_periods(wav.shape[-1])
        pad = tpad - wav.shape[-1]
        real = jnp.pad(wav, ((0, 0), (0, pad)))

        # ---- discriminator update (no generator grads)
        recon0 = jax.lax.stop_gradient(
            SnacCodec(cfg).apply(gen_params, wav, method=SnacCodec.roundtrip))
        fake0 = jnp.pad(recon0, ((0, 0), (0, pad)))

        def d_objective(dp):
            return d_loss_fn(disc.apply(dp, real), disc.apply(dp, fake0))

        d_l, d_grads = jax.value_and_grad(d_objective)(disc_params)
        d_updates, d_opt = dtx.update(d_grads, d_opt, disc_params)
        disc_params = optax.apply_updates(disc_params, d_updates)

        # ---- generator (decoder) update against the updated discriminator
        outs_real = disc.apply(disc_params, real)

        def g_objective(gp):
            recon = SnacCodec(cfg).apply(gp, wav, method=SnacCodec.roundtrip)
            rec_loss, metrics = recon_losses(cfg, wav, recon, sisnr_weight)
            outs_fake = disc.apply(disc_params, jnp.pad(recon, ((0, 0), (0, pad))))
            adv = g_adv_loss_fn(outs_fake)
            fm = feature_match_fn(outs_real, outs_fake)
            loss = rec_loss + adv_weight * adv + fm_weight * fm
            return loss, dict(metrics, adv=adv, fm=fm, d_loss=d_l, loss=loss)

        (_, metrics), g_grads = jax.value_and_grad(g_objective, has_aux=True)(gen_params)
        g_updates, g_opt = gtx.update(g_grads, g_opt, gen_params)
        gen_params = optax.apply_updates(gen_params, g_updates)
        return gen_params, disc_params, g_opt, d_opt, metrics

    return jax.jit(step, donate_argnums=(0, 1, 2, 3))
