"""Latent-PCA toolkit: fit correctness, attack functions, delta metrics,
head/tail decomposition (components C22-C27)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nawc_tpu.interp.latent_pca import (
    amputation_fn,
    fit_pca,
    head_tail_energy,
    jamming_fn,
    latent_delta_metrics,
    pca_project,
    pca_reconstruct,
    rounding_fn,
)


@pytest.fixture(scope="module")
def anisotropic():
    """(500, 8) data with two dominant directions."""
    rng = np.random.default_rng(0)
    basis = np.linalg.qr(rng.normal(size=(8, 8)))[0]
    scales = np.array([10, 5, 1, 0.5, 0.2, 0.1, 0.05, 0.01])
    return jnp.asarray((rng.normal(size=(500, 8)) * scales) @ basis.T, jnp.float32)


def test_fit_pca_recovers_spectrum(anisotropic):
    mean, comps, var = fit_pca(anisotropic, 8)
    assert comps.shape == (8, 8)
    # orthonormal components
    np.testing.assert_allclose(np.asarray(comps @ comps.T), np.eye(8), atol=1e-4)
    # variance spectrum ordered and matching the construction ratio
    v = np.asarray(var)
    assert (np.diff(v) <= 1e-5).all()
    assert v[0] / v[1] == pytest.approx(4.0, rel=0.4)  # (10/5)^2


def test_project_reconstruct_roundtrip(anisotropic):
    mean, comps, _ = fit_pca(anisotropic, 8)
    c = pca_project(anisotropic, mean, comps)
    back = pca_reconstruct(c, mean, comps)
    np.testing.assert_allclose(np.asarray(back), np.asarray(anisotropic), atol=1e-3)


def test_amputation_removes_tail_energy(anisotropic):
    mean, comps, _ = fit_pca(anisotropic, 8)
    fn = amputation_fn(mean, comps, keep_k=2)
    out = fn(anisotropic)
    c = np.asarray(pca_project(out, mean, comps))
    assert np.abs(c[:, 2:]).max() < 1e-3
    assert np.abs(c[:, :2]).max() > 1.0  # head preserved


def test_jamming_replaces_tail(anisotropic):
    mean, comps, _ = fit_pca(anisotropic, 8)
    fn = jamming_fn(mean, comps, keep_k=2, key=jax.random.PRNGKey(0), scale=2.0)
    out = fn(anisotropic)
    c_in = np.asarray(pca_project(anisotropic, mean, comps))
    c_out = np.asarray(pca_project(out, mean, comps))
    np.testing.assert_allclose(c_out[:, :2], c_in[:, :2], atol=1e-3)
    # tail variance inflated ~2x sigma
    assert c_out[:, 2:].std() > 1.5 * c_in[:, 2:].std()


def test_rounding_quantizes():
    z = jnp.asarray([[0.11, 0.29, -0.41]])
    out = np.asarray(rounding_fn(5.0)(z))
    np.testing.assert_allclose(out, [[0.2, 0.2, -0.4]], atol=1e-6)


def test_latent_delta_metrics_shapes():
    rng = np.random.default_rng(1)
    zc = jnp.asarray(rng.normal(size=(3, 10, 8)).astype(np.float32))
    zm = zc + 0.1 * jnp.asarray(rng.normal(size=(3, 10, 8)).astype(np.float32))
    m = latent_delta_metrics(zc, zm, n_pca=4)
    assert m["delta_l2"].shape == (3,)
    assert m["latent_snr_db"].shape == (3,)
    assert (m["latent_snr_db"] > 10).all()  # 0.1 noise on unit data ~ 20 dB
    assert m["pca_cumvar"].shape == (4,)
    assert (np.diff(m["pca_cumvar"]) >= -1e-6).all()


def test_head_tail_energy_partition(anisotropic):
    mean, comps, _ = fit_pca(anisotropic, 8)
    dz = anisotropic - mean
    head, tail = head_tail_energy(dz, comps, head_k=2)
    total = float(jnp.sum(dz**2))
    assert head + tail == pytest.approx(total, rel=1e-3)
    assert head > 0.9 * total  # two directions carry ~99% of the variance
