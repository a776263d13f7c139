"""Fused whiten+correlate kernel (ops/sswm.py): exactness against the
original jnp detector math, in interpreter mode (CPU) and — when a TPU is
actually attached — compiled."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nawc_tpu.models import SpreadSpectrumWM, random_message
from nawc_tpu.ops.sswm import (
    _whiten_correlate_pallas,
    whiten_correlate,
    whiten_correlate_reference,
)

_OFFS = (17, 23, 29, 37, 47, 53)


def _case(b=5, t=126, w=358, k=16, seed=0):
    rng = np.random.default_rng(seed)
    r = jnp.asarray(rng.standard_normal((b, t, w)) * 0.3, jnp.float32)
    p = jnp.sign(jnp.asarray(rng.standard_normal((k, t, w)), jnp.float32))
    return r, p


def test_kernel_matches_reference_interpret():
    r, p = _case()
    ref = whiten_correlate_reference(r, p, _OFFS)
    got = _whiten_correlate_pallas(r, p, _OFFS, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3)


def test_kernel_odd_shapes_interpret():
    # non-aligned B/T/W exercise the sublane/lane padding paths
    r, p = _case(b=3, t=77, w=130, k=16, seed=1)
    ref = whiten_correlate_reference(r, p, _OFFS)
    got = _whiten_correlate_pallas(r, p, _OFFS, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3)


def test_wrapper_defaults_to_reference_off_tpu():
    r, p = _case(b=2, t=64, w=128, k=8, seed=2)
    got = whiten_correlate(r, p, _OFFS)
    ref = whiten_correlate_reference(r, p, _OFFS)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_detector_statistics_unchanged(librispeech_16k):
    """End-to-end guard: detect() through the refactored _correlate keeps
    its semantics — marked bits recover, unmarked z stays null."""
    wm = SpreadSpectrumWM()
    wav = librispeech_16k[:2]
    msg = random_message(jax.random.PRNGKey(3), 2, wm.n_bits)
    marked = wm.embed(wav, msg)
    presence, bits = wm.detect(marked)
    assert float(jnp.mean((bits == msg).astype(jnp.float32))) > 0.95
    assert float(presence.min()) > 0.6
    presence0, _ = wm.detect(wav)
    assert float(presence0.max()) < 0.4


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs real TPU")
def test_kernel_compiled_on_tpu():
    """Hardware exactness at the showcase (2 s), bench (4 s), and odd
    shapes that previously MosaicError'd (VERDICT r2 #1).  Run via
    NAWC_TPU_TESTS=1 pytest -k on_tpu."""
    # last case = psychoacoustic detect shape (K=60 coded bits): its KP=64
    # pattern stack forced the VMEM-budgeted t_tile=32 path that the fixed
    # 128-frame tile OOM'd on ('scoped allocation with size 32.00M', r3)
    for b, t, w, k in [(16, 126, 367, 16), (16, 376, 367, 16), (3, 77, 130, 16),
                       (8, 250, 450, 60)]:
        r, p = _case(b=b, t=t, w=w, k=k)
        ref = whiten_correlate_reference(r, p, _OFFS)
        got = _whiten_correlate_pallas(r, p, _OFFS)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-2)


def test_xla_fast_path_matches_reference():
    """The cancellation-based single-matmul path is mathematically
    identical to the whiten-then-correlate reference."""
    from nawc_tpu.ops.sswm import _whiten_correlate_xla

    for seed in range(3):
        r, p = _case(b=4, t=130, w=200, k=16, seed=seed)
        ref = whiten_correlate_reference(r, p, _OFFS)
        got = _whiten_correlate_xla(r, p, _OFFS)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
