"""Adversarial decoder fine-tune tests: discriminator shapes, decoder-only
gradient mask, and one full GAN step (losses finite, frozen subtrees frozen)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nawc_tpu.codec.model import SnacCodec
from nawc_tpu.train.adversarial import (Discriminators, decoder_only_mask,
                                        decoder_only_tx, init_discriminators,
                                        make_gan_train_step, pad_for_periods)
from nawc_tpu.utils.config import CodecConfig

CFG = CodecConfig(
    encoder_dim=8, encoder_rates=(2, 4, 8, 8), latent_dim=64,
    decoder_dim=64, decoder_rates=(8, 8, 4, 2),
    codebook_size=128, codebook_dim=8, vq_strides=(4, 2, 1),
)


def test_pad_for_periods():
    t = pad_for_periods(CFG.chunk)
    assert t >= CFG.chunk
    for p in (2, 3, 5, 7, 11, 4):
        assert t % p == 0


def test_discriminator_shapes():
    t = pad_for_periods(CFG.chunk)
    x = jnp.zeros((2, t), jnp.float32)
    params = init_discriminators(jax.random.PRNGKey(0), CFG.chunk)
    outs = Discriminators().apply(params, x)
    assert len(outs) == 8  # 5 periods + 3 scales
    for logits, feats in outs:
        assert logits.shape[0] == 2 and logits.ndim == 2
        assert len(feats) == 4


def test_decoder_only_mask():
    params = SnacCodec(CFG).init(jax.random.PRNGKey(0), jnp.zeros((1, CFG.chunk)))
    mask = decoder_only_mask(params)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    dec = [v for path, v in flat if any(getattr(p, "key", None) == "decoder" for p in path)]
    other = [v for path, v in flat if not any(getattr(p, "key", None) == "decoder" for p in path)]
    assert dec and all(dec)
    assert other and not any(other)


def test_gan_step_freezes_encoder():
    key = jax.random.PRNGKey(0)
    gen_params = SnacCodec(CFG).init(key, jnp.zeros((1, CFG.chunk)))
    # At init the decoder's final conv is zero-init, which blocks every
    # upstream gradient — encoder grads would be exactly zero and the test
    # could not distinguish "frozen" from "received a zero update" (this hid
    # the optax.masked raw-gradient passthrough bug).  Jitter ALL decoder
    # leaves so encoder/quantizer gradients are nonzero like in a real
    # fine-tune of a trained checkpoint.
    jkey = jax.random.PRNGKey(7)
    dec = gen_params["params"]["decoder"]
    leaves, treedef = jax.tree_util.tree_flatten(dec)
    jittered = [
        leaf + 0.02 * jax.random.normal(jax.random.fold_in(jkey, i), leaf.shape)
        for i, leaf in enumerate(leaves)
    ]
    gen_params = {"params": {**gen_params["params"],
                             "decoder": jax.tree_util.tree_unflatten(treedef, jittered)}}
    # sanity: the thing we freeze must actually have nonzero gradients here
    def _loss(p):
        r = SnacCodec(CFG).apply(p, wav_probe, method=SnacCodec.roundtrip)
        return jnp.mean((r - wav_probe) ** 2)
    wav_probe = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, CFG.chunk)).astype(np.float32)) * 0.1
    g = jax.grad(_loss)(gen_params)
    enc_gnorm = optax.global_norm(g["params"]["encoder"])
    assert float(enc_gnorm) > 0.0

    disc_params = init_discriminators(jax.random.PRNGKey(1), CFG.chunk)
    gtx = decoder_only_tx(optax.adam(1e-3), gen_params)
    dtx = optax.adam(1e-3)
    step = make_gan_train_step(CFG, gtx, dtx, sisnr_weight=0.05)

    wav = jnp.asarray(np.random.default_rng(0).normal(size=(2, CFG.chunk)).astype(np.float32)) * 0.1
    # snapshot before the step: the jitted step donates its param buffers
    before = jax.device_get(gen_params)
    da = [np.array(x) for x in jax.tree_util.tree_leaves(jax.device_get(disc_params))]
    g2, d2, _, _, metrics = step(gen_params, disc_params,
                                 gtx.init(gen_params), dtx.init(disc_params), wav)
    for k in ("loss", "adv", "fm", "d_loss", "si_snr"):
        assert np.isfinite(float(metrics[k])), k
    after = jax.device_get(g2)
    # encoder + quantizer bit-identical; decoder moved
    for sub in ("encoder", "quantizer"):
        a = jax.tree_util.tree_leaves(before["params"][sub])
        b = jax.tree_util.tree_leaves(after["params"][sub])
        assert all(np.array_equal(x, y) for x, y in zip(a, b)), sub
    dec_a = jax.tree_util.tree_leaves(before["params"]["decoder"])
    dec_b = jax.tree_util.tree_leaves(after["params"]["decoder"])
    assert any(not np.array_equal(x, y) for x, y in zip(dec_a, dec_b))
    # discriminator moved too
    db = jax.tree_util.tree_leaves(jax.device_get(d2))
    assert any(not np.array_equal(x, y) for x, y in zip(da, db))
