"""Interpretability layer: probes, axis estimation, ablation sweep, MC
uncertainty, saliency, feature importance, spectral analysis
(SURVEY.md components C9-C19; BASELINE config #5)."""

import numpy as np
import jax
import jax.numpy as jnp
import pandas as pd
import pytest

from nawc_tpu.codec import make_codec
from nawc_tpu.interp import (
    agg_stats,
    band_energies,
    compute_feature_importance,
    estimate_axis,
    expected_calibration_error,
    get_latent,
    get_mean_latent,
    input_gradient,
    integrated_gradients,
    mc_statistics,
    reliability_curve,
    residual_report,
    run_layer_ablation,
    trajectory_stats,
    variance_error_auc,
)
from nawc_tpu.models import SpreadSpectrumWM, random_message
from nawc_tpu.utils.config import CodecConfig

CFG = CodecConfig(
    encoder_dim=8, latent_dim=64, decoder_dim=64,
    codebook_size=128, codebook_dim=8,
)


@pytest.fixture(scope="module")
def codec():
    return make_codec(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def speech(librispeech_16k):
    return librispeech_16k[:4]


def test_probe_shapes(codec, speech):
    z = get_latent(codec, speech)
    assert z.shape == (4, 32768 // CFG.hop, CFG.latent_dim)
    m = get_mean_latent(codec, speech)
    assert m.shape == (4, CFG.latent_dim)


def test_estimate_axis(codec, speech):
    wm = SpreadSpectrumWM()
    msg = random_message(jax.random.PRNGKey(0), 4, 16)
    marked = wm.embed(speech, msg)
    axis = estimate_axis(codec, speech, marked)
    assert axis.shape == (CFG.latent_dim,)
    np.testing.assert_allclose(float(jnp.linalg.norm(axis)), 1.0, rtol=1e-4)
    stats = trajectory_stats(codec, axis, speech, marked, marked)
    assert set(stats) >= {"clean_proj_mean", "wm_proj_mean", "att_proj_mean", "delta_wm", "delta_att"}
    np.testing.assert_allclose(stats["delta_att"], 0.0, atol=1e-5)


def test_layer_ablation_sweep(codec, speech):
    wm = SpreadSpectrumWM()
    df = run_layer_ablation(codec, {"ss": wm}, speech[:2], in_sr=16_000)
    assert set(df["mask"]) == {"full_all", "drop_last_1", "drop_last_2",
                               "keep_only_0", "keep_only_1", "keep_only_2"}
    assert len(df) == 6 * 2


def test_mc_uncertainty(speech):
    wm = SpreadSpectrumWM()
    msg = random_message(jax.random.PRNGKey(1), 4, 16)
    marked = wm.embed(speech, msg)
    both = jnp.concatenate([marked, speech])
    labels = np.array([1, 1, 1, 1, 0, 0, 0, 0])
    stats = mc_statistics(wm.score, both, jax.random.PRNGKey(2), labels=labels, n_samples=8)
    assert stats["mc_mean_prob"].shape == (8,)
    assert (stats["mc_var_prob"] >= 0).all()
    assert stats["correct"].mean() >= 0.85
    # calibration machinery runs
    c, a, n = reliability_curve(stats["mc_mean_prob"], labels, n_bins=5)
    assert len(c) == len(a) == len(n)
    ece = expected_calibration_error(stats["mc_mean_prob"], labels)
    assert np.isfinite(ece)
    auc = variance_error_auc(stats["mc_var_prob"], stats["correct"])
    assert np.isnan(auc) or 0.0 <= auc <= 1.0


def test_saliency(speech):
    wm = SpreadSpectrumWM()
    msg = random_message(jax.random.PRNGKey(3), 4, 16)
    marked = wm.embed(speech, msg)
    g = input_gradient(lambda w: wm.score(w, msg), marked)
    assert g.shape == marked.shape
    assert float(jnp.abs(g).max()) > 0
    ig = integrated_gradients(lambda w: wm.score(w, msg), marked, steps=4)
    assert ig.shape == marked.shape
    assert bool(jnp.isfinite(ig).all())


def test_feature_importance_and_agg():
    rng = np.random.default_rng(0)
    n = 200
    x = rng.normal(size=n)
    df = pd.DataFrame({
        "attack_type": rng.choice(["mp3", "noise"], n),
        "a": x,
        "b": -2 * x + 0.1 * rng.normal(size=n),
        "c": rng.normal(size=n),
        "target": x + 0.05 * rng.normal(size=n),
    })
    imp = compute_feature_importance(df, "target")
    assert imp.iloc[0]["feature"] in ("a", "b")
    assert imp["abs_pearson"].iloc[0] > 0.9
    agg = agg_stats(df, ["attack_type"])
    assert "a_mean" in agg.columns and "a_std" in agg.columns and "n" in agg.columns
    assert len(agg) == 2


def test_spectral_residual(speech):
    wm = SpreadSpectrumWM()
    msg = random_message(jax.random.PRNGKey(4), 4, 16)
    marked = wm.embed(speech, msg)
    rep = residual_report(speech, marked)
    assert rep["snr_db"].shape == (4,)
    assert (rep["snr_db"] > 10).all()
    assert rep["band_energy"].shape == (4, 8)
    # watermark lives in the embedding band, not at DC
    be = rep["band_energy"].mean(axis=0)
    assert be[0] < be[1:4].max() * 10
