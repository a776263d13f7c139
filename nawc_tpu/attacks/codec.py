"""Neural-codec attacks: LALM round-trip, layer ablation, latent-space ops.

The reference's centerpiece attacker ``QwenOmniAttack`` simulates a
Qwen-Omni/Mini-Omni tokenizer by resampling to 24 kHz, running SNAC
encode->quantize->decode, resampling back, and fixing the length
(``watermark_testing.py:31-79``).  Its ablation variant zeroes selected
codebook layers before decode (``run_snac_layer_ablation.py:92-134``).
Here both are pure jitted functions over a :class:`~nawc_tpu.codec.CodecState`
— the whole embed->attack->detect chain stays on-device (the reference hops
GPU<->CPU on every step, SURVEY.md §3 boundary note).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..codec.api import CodecState
from ..dsp.resample import resample
from ..utils.padding import fix_length, pad_to_multiple


def _norm_gain(wav: jnp.ndarray, target_peak: float = 0.7) -> jnp.ndarray:
    """Per-clip gain to the codec's training loudness (speech_batches peak-
    normalizes to 0.7; feeding other levels degrades reconstruction)."""
    peak = jnp.max(jnp.abs(wav), axis=-1, keepdims=True)
    return target_peak / jnp.maximum(peak, 1e-4)


def codec_roundtrip(
    codec: CodecState, wav: jnp.ndarray, in_sr: int | None = None
) -> jnp.ndarray:
    """LALM/tokenizer attack: resample -> encode -> quantize -> decode ->
    resample back -> length fix (``watermark_testing.py:42-79``).

    `wav` is (B, T) at `in_sr` (defaults to the codec rate).  Input is
    peak-normalized into the codec's training distribution and the original
    level is restored afterwards (level-invariant attack)."""
    sr = codec.cfg.sample_rate
    t_in = wav.shape[-1]
    x = wav if (in_sr is None or in_sr == sr) else resample(wav, in_sr, sr)
    g = _norm_gain(x)
    x = pad_to_multiple(x * g, codec.cfg.chunk, axis=-1)
    y = codec.roundtrip(x) / g
    if in_sr is not None and in_sr != sr:
        y = resample(y, sr, in_sr)
    return fix_length(y, t_in)


def layer_ablation(
    codec: CodecState, wav: jnp.ndarray, level_mask: jnp.ndarray, in_sr: int | None = None
) -> jnp.ndarray:
    """Codec round-trip with selected RVQ levels zeroed
    (``run_snac_layer_ablation.py:92-134``).  `level_mask` is
    (num_levels,) in {0,1}."""
    sr = codec.cfg.sample_rate
    t_in = wav.shape[-1]
    x = wav if (in_sr is None or in_sr == sr) else resample(wav, in_sr, sr)
    g = _norm_gain(x)
    x = pad_to_multiple(x * g, codec.cfg.chunk, axis=-1)
    codes = codec.encode(x)
    y = codec.decode(codes, level_mask=level_mask) / g
    if in_sr is not None and in_sr != sr:
        y = resample(y, sr, in_sr)
    return fix_length(y, t_in)


def ablation_masks(num_levels: int) -> dict[str, jnp.ndarray]:
    """The reference's mask families (``run_snac_layer_ablation.py:137-162``):
    full_all, drop_last_k (k=1..L-1), keep_only_i (i=0..L-1)."""
    masks: dict[str, jnp.ndarray] = {"full_all": jnp.ones(num_levels)}
    for k in range(1, num_levels):
        m = jnp.ones(num_levels).at[num_levels - k :].set(0.0)
        masks[f"drop_last_{k}"] = m
    for i in range(num_levels):
        m = jnp.zeros(num_levels).at[i].set(1.0)
        masks[f"keep_only_{i}"] = m
    return masks


def latent_roundtrip(
    codec: CodecState, wav: jnp.ndarray, in_sr: int | None = None
) -> jnp.ndarray:
    """Quantizer-BYPASS round-trip (continuous latents), the reference's
    EnCodec decode-from-encoder-output path (``attack_baselines.py:44-66``).

    This is the MILD neural-codec resynthesis: no RVQ information loss,
    so it plays the role of the reference suite's high-bitrate `encodec`
    attack (AudioSeal keeps bitwise 0.954 under it,
    ``audioseal_stats_loose/stats_by_attack.csv`` row 5) while the full
    RVQ `codec_roundtrip` matches the destructive `dac` row (bitwise
    0.531, hard 0.000 — identical to our measured roundtrip behavior)."""
    sr = codec.cfg.sample_rate
    t_in = wav.shape[-1]
    x = wav if (in_sr is None or in_sr == sr) else resample(wav, in_sr, sr)
    g = _norm_gain(x)
    x = pad_to_multiple(x * g, codec.cfg.chunk, axis=-1)
    z = codec.encode_latent(x)
    y = codec.decode_latent(z) / g
    if in_sr is not None and in_sr != sr:
        y = resample(y, sr, in_sr)
    return fix_length(y, t_in)


def latent_transform_attack(codec: CodecState, wav: jnp.ndarray, fn) -> jnp.ndarray:
    """Generic latent-space attack: encode continuously, apply `fn` to the
    latents (PCA amputation/jamming, rounding, ... — the reference's
    ``attack_baselines.py:189-216`` family), decode."""
    t_in = wav.shape[-1]
    x = pad_to_multiple(wav, codec.cfg.chunk, axis=-1)
    z = codec.encode_latent(x)
    return fix_length(codec.decode_latent(fn(z)), t_in)
