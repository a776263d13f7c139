"""Test configuration: force CPU backend with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (the driver's
dryrun uses the same mechanism).

Note: the axon TPU shim registers its PJRT backend at interpreter start
(sitecustomize), so env vars alone don't stick — we must also flip
``jax_platforms`` via jax.config after import.
"""

import os

# NAWC_TPU_TESTS=1 keeps the live TPU backend so the hardware exactness
# tests (test_*_on_tpu) actually run on the chip:
#   NAWC_TPU_TESTS=1 pytest tests/ -k on_tpu
_USE_TPU = os.environ.get("NAWC_TPU_TESTS", "") == "1"

flags = os.environ.get("XLA_FLAGS", "")
if not _USE_TPU and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

if not _USE_TPU:
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) == 8


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def librispeech_16k():
    """(8, 32000) real speech @16 kHz from the reference dataset dir."""
    import glob
    import jax.numpy as jnp
    from nawc_tpu.utils import audio_io
    from nawc_tpu.dsp import resample

    files = sorted(glob.glob("/root/reference/dataset/LibriSpeech/*.wav"))[:8]
    if len(files) < 8:
        pytest.skip("LibriSpeech sample data unavailable")
    wavs = []
    for f in files:
        a, sr = audio_io.read_wav(f)
        x = jnp.asarray(a.mean(axis=0))
        if sr != 16_000:
            x = resample(x, sr, 16_000)
        x = np.asarray(x)[:32_000]
        if len(x) < 32_000:
            x = np.pad(x, (0, 32_000 - len(x)))
        wavs.append(x)
    return jnp.asarray(np.stack(wavs).astype(np.float32))


@pytest.fixture(scope="session")
def tone_24k():
    """1 s, 24 kHz mono test tone (sum of harmonics with an envelope)."""
    sr = 24_000
    t = np.arange(sr) / sr
    x = (
        0.5 * np.sin(2 * np.pi * 220 * t)
        + 0.25 * np.sin(2 * np.pi * 440 * t)
        + 0.125 * np.sin(2 * np.pi * 1760 * t)
    ) * (0.5 + 0.5 * np.sin(2 * np.pi * 2.0 * t))
    return x.astype(np.float32), sr
