"""Neural additive watermarker: shapes, detector layout, training step
learns (bit accuracy and presence separation improve in a few steps)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from nawc_tpu.models import init_neural_wm, random_message
from nawc_tpu.train import init_wm_train, make_wm_train_step
from nawc_tpu.utils.config import NeuralWMConfig

CFG = NeuralWMConfig(dim=4, bottleneck_dim=16, n_bits=16)
T = 8_000


@pytest.fixture(scope="module")
def wm():
    return init_neural_wm(jax.random.PRNGKey(0), CFG, example_len=T)


def test_generator_shapes_and_zero_init(wm, librispeech_16k):
    wav = librispeech_16k[:2, :T]
    msg = random_message(jax.random.PRNGKey(1), 2, CFG.n_bits)
    marked = wm.embed(wav, msg)
    assert marked.shape == wav.shape
    # zero-init output conv -> untrained watermark is silent
    np.testing.assert_allclose(np.asarray(marked), np.asarray(wav), atol=1e-6)


def test_detector_layout(wm, librispeech_16k):
    wav = librispeech_16k[:2, :T]
    lg = wm.logits(wav)
    assert lg.shape == (2, T, 2 + CFG.n_bits)
    presence, bits = wm.detect(wav)
    assert presence.shape == (2,)
    assert bits.shape == (2, CFG.n_bits)
    assert (np.asarray(presence) >= 0).all() and (np.asarray(presence) <= 1).all()


def test_message_changes_delta(librispeech_16k):
    """After perturbing gen params away from zero-init, different messages
    must produce different watermarks."""
    wm = init_neural_wm(jax.random.PRNGKey(0), CFG, example_len=T)
    gen = jax.tree_util.tree_map(
        lambda x: x + 0.01 * np.random.default_rng(0).normal(size=x.shape).astype(np.float32),
        wm.gen_params,
    )
    import dataclasses

    wm2 = dataclasses.replace(wm, gen_params=gen)
    wav = librispeech_16k[:1, :T]
    m0 = jnp.zeros((1, CFG.n_bits), jnp.int32)
    m1 = jnp.ones((1, CFG.n_bits), jnp.int32)
    d0 = wm2.embed(wav, m0) - wav
    d1 = wm2.embed(wav, m1) - wav
    assert float(jnp.abs(d0 - d1).max()) > 0


def test_train_step_learns(librispeech_16k):
    tx = optax.adam(5e-3)
    state = init_wm_train(jax.random.PRNGKey(0), CFG, tx, example_len=T)
    step_fn = make_wm_train_step(CFG, tx)
    gen, det, opt = state.gen_params, state.det_params, state.opt_state
    wav = librispeech_16k[:4, :T]
    key = jax.random.PRNGKey(1)
    msg = random_message(jax.random.PRNGKey(2), 4, CFG.n_bits)
    first = None
    for i in range(60):
        key, kk = jax.random.split(key)
        gen, det, opt, metrics = step_fn(gen, det, opt, wav, msg, kk, jnp.asarray(4 * i))  # attack 'none'
        if first is None:
            first = {k: float(v) for k, v in metrics.items()}
    last = {k: float(v) for k, v in metrics.items()}
    # direction-of-learning check (a 60-step run of a tiny model is not a
    # convergence test; full training is the train_wm CLI's job)
    assert last["bit_loss"] < first["bit_loss"]
    assert last["ce_marked"] < first["ce_marked"]
    assert last["ce_clean"] < first["ce_clean"]
    assert last["bit_acc"] > 0.55  # above chance and climbing


def test_windowed_embed_detect_semantics(librispeech_16k):
    """Embed/detect chunk the stream at cfg.window (the message pattern is
    lattice-anchored per window — whole-clip reads at other offsets decode
    at chance, measured in round 2).  Embed must equal per-window embeds
    concatenated; detect must mask final-window padding."""
    import dataclasses

    cfg = dataclasses.replace(CFG, window=4000)
    wm = init_neural_wm(jax.random.PRNGKey(0), cfg, example_len=4000)
    gen = jax.tree_util.tree_map(
        lambda x: x + 0.01 * np.random.default_rng(0).normal(size=x.shape).astype(np.float32),
        wm.gen_params,
    )
    wm = dataclasses.replace(wm, gen_params=gen)
    wav = librispeech_16k[:1, :T]  # 8000 = 2 windows
    msg = random_message(jax.random.PRNGKey(1), 1, cfg.n_bits)
    marked = wm.embed(wav, msg)
    assert marked.shape == wav.shape
    w0 = wm.embed(wav[:, :4000], msg)
    w1 = wm.embed(wav[:, 4000:], msg)
    np.testing.assert_allclose(np.asarray(marked[:, :4000]), np.asarray(w0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(marked[:, 4000:]), np.asarray(w1), atol=1e-6)
    # ragged final window: shapes still (B,), (B, n_bits); finite outputs
    pres, bits = wm.detect(marked[:, :6500])
    assert pres.shape == (1,) and bits.shape == (1, cfg.n_bits)
    assert np.isfinite(np.asarray(pres)).all()


def test_detect_sync_contract(wm, librispeech_16k):
    """detect_sync (round 5): parity-complete offset grid, grouped scan,
    gather re-alignment.  With random weights the bits are meaningless, so
    this pins the CONTRACT: shapes, offsets on the configured grid, both
    polarities scanned without error, determinism."""
    x = librispeech_16k[:2, :T]
    pres, bits, off = wm.detect_sync(x, step=80, group=2)
    assert pres.shape == (2,) and bits.shape == (2, CFG.n_bits)
    offs = np.asarray(off)
    period = int(np.prod(CFG.strides))
    grid = set(range(0, period, 80)) | set(range(1, period, 80))
    assert set(offs.tolist()) <= grid
    pres2, bits2, off2 = wm.detect_sync(x, step=80, group=2)
    np.testing.assert_array_equal(offs, np.asarray(off2))
    np.testing.assert_array_equal(np.asarray(bits), np.asarray(bits2))
