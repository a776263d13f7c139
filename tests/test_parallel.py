"""Mesh/sharding paths on the 8-device virtual CPU mesh: data-parallel
training step equivalence, tensor-parallel codebook lookup exactness,
sharded batch placement (SURVEY.md §2.3 — new TPU capability)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from nawc_tpu.ops import nearest_codebook_reference
from nawc_tpu.parallel import (
    data_sharding,
    make_mesh,
    replicate_sharding,
    shard_batch,
    tp_nearest_codebook,
)
from nawc_tpu.train import init_codec_train, make_codec_train_step
from nawc_tpu.train.codec_train import make_optimizer
from nawc_tpu.utils.config import CodecConfig

CFG = CodecConfig(
    encoder_dim=8, latent_dim=64, decoder_dim=64,
    codebook_size=128, codebook_dim=8,
)


def test_mesh_shapes():
    mesh = make_mesh(n_data=4, n_model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh1 = make_mesh()
    assert mesh1.shape["data"] == 8


def test_shard_batch_placement():
    mesh = make_mesh(n_data=8, n_model=1)
    x = jnp.arange(16 * 4, dtype=jnp.float32).reshape(16, 4)
    xs = shard_batch(x, mesh)
    assert len(xs.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))


def test_tp_lookup_matches_reference():
    mesh = make_mesh(n_data=4, n_model=2)
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32))
    cb = jnp.asarray(rng.normal(size=(128, 8)).astype(np.float32))
    got = np.asarray(tp_nearest_codebook(z, cb, mesh))
    want = np.asarray(nearest_codebook_reference(z, cb))
    np.testing.assert_array_equal(got, want)


def test_dp_train_step_matches_single_device():
    """One sharded step == one unsharded step (same grads via psum)."""
    tx = make_optimizer(lr=1e-3, total=10)
    state, _ = init_codec_train(jax.random.PRNGKey(0), CFG, tx=tx, example_len=CFG.chunk)
    wav = jnp.asarray(
        np.random.default_rng(1).normal(size=(8, CFG.chunk)).astype(np.float32) * 0.1
    )

    step_plain = make_codec_train_step(CFG, tx)
    p1, o1, m1 = step_plain(
        jax.tree_util.tree_map(jnp.copy, state.params),
        jax.tree_util.tree_map(jnp.copy, state.opt_state), wav)

    mesh = make_mesh(n_data=8, n_model=1)
    step_mesh = make_codec_train_step(CFG, tx, mesh=mesh)
    p2, o2, m2 = step_mesh(
        jax.tree_util.tree_map(jnp.copy, state.params),
        jax.tree_util.tree_map(jnp.copy, state.opt_state),
        shard_batch(wav, mesh))

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-3
    l1 = jax.tree_util.tree_leaves(p1)
    l2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_sharded_eval_pipeline_matches_unsharded():
    """embed -> codec-roundtrip -> detect partitioned over "data" (8 devices)
    == the single-device run (VERDICT r2 #8: the EVAL path, not just the
    train step, exercised multi-device)."""
    from nawc_tpu.attacks.codec import codec_roundtrip
    from nawc_tpu.codec import make_codec
    from nawc_tpu.models import SpreadSpectrumWM
    from nawc_tpu.parallel.eval import make_sharded_eval
    from nawc_tpu.utils.config import SpreadSpectrumConfig

    codec = make_codec(jax.random.PRNGKey(0), CFG)
    wm = SpreadSpectrumWM(cfg=SpreadSpectrumConfig(
        sample_rate=CFG.sample_rate, band_hi_hz=9000.0, alpha=0.1))
    rng = np.random.default_rng(3)
    wav = jnp.asarray(rng.normal(size=(8, 2 * CFG.chunk)).astype(np.float32) * 0.1)
    msg = jnp.asarray(rng.integers(0, 2, (8, wm.n_bits)), jnp.int32)

    mesh = make_mesh(n_data=8, n_model=1)
    run = make_sharded_eval(codec, wm, mesh)
    marked_s, attacked_s, presence_s, bits_s = run(wav, msg)
    assert len(presence_s.sharding.device_set) == 8
    assert marked_s.sharding.spec[0] == "data"

    marked = wm.embed(wav, msg)
    attacked = codec_roundtrip(codec, marked, in_sr=wm.sample_rate)
    presence, bits = wm.detect(attacked)
    np.testing.assert_allclose(np.asarray(marked_s), np.asarray(marked), atol=1e-5)
    np.testing.assert_allclose(np.asarray(attacked_s), np.asarray(attacked), atol=1e-4)
    np.testing.assert_allclose(np.asarray(presence_s), np.asarray(presence), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(bits_s), np.asarray(bits))


def test_sharding_helpers():
    mesh = make_mesh(n_data=8)
    ds = data_sharding(mesh, 3)
    rs = replicate_sharding(mesh)
    assert ds.spec[0] == "data" and ds.spec[1] is None
    assert all(s is None for s in rs.spec)
