"""ResampledWM adapter: fixed-rate methods presented at a foreign rate
(powers the all-methods manifold/ablation sweeps, reference
run_manifold_analysis_all.py:325-515)."""

import jax
import jax.numpy as jnp
import numpy as np

from nawc_tpu.models import ChunkedWM, SpreadSpectrumWM, at_rate, random_message
from nawc_tpu.models.resampled import ResampledWM


def test_at_rate_passthrough():
    wm = SpreadSpectrumWM()
    assert at_rate(wm, wm.cfg.sample_rate) is wm
    wrapped = at_rate(wm, 24_000)
    assert isinstance(wrapped, ResampledWM)
    assert wrapped.n_bits == wm.n_bits and wrapped.name == wm.name


def test_wrapped_chunked_embeds_and_detects_at_24k(librispeech_16k):
    from nawc_tpu.dsp import resample

    wav24 = resample(librispeech_16k[:4], 16_000, 24_000)
    wm = at_rate(ChunkedWM(), 24_000)
    msg = random_message(jax.random.PRNGKey(0), 4, wm.n_bits)
    marked = wm.embed(wav24, msg, jax.random.PRNGKey(1))
    assert marked.shape == wav24.shape
    # the watermark band sits far below the 8 kHz resample cutoff, so the
    # extra 24k<->16k round-trips must not break decoding
    pres, bits = wm.detect(marked)
    acc = float(jnp.mean((bits == msg).astype(jnp.float32)))
    assert acc > 0.95
    assert float(pres.min()) > 0.5
    pres_clean, _ = wm.detect(wav24)
    assert float(pres_clean.max()) < 0.5
    # scores keep the inner method's semantics
    s = np.asarray(wm.score(marked, msg))
    assert (s > 0.9).all()


def test_quality_protocol_invariant_to_embed_rate(librispeech_16k):
    """evaluate_pair_batch measures at 16 kHz whatever rate the pair comes
    in at (reference protocol, evaluate_quality.py:20-27): feeding the same
    pair upsampled to 24 kHz must give ~the same metrics."""
    from nawc_tpu.dsp import resample
    from nawc_tpu.eval.quality import evaluate_pair_batch

    wm = SpreadSpectrumWM()
    msg = random_message(jax.random.PRNGKey(0), 2, 16)
    clean = librispeech_16k[:2]
    marked = wm.embed(clean, msg)
    a = evaluate_pair_batch(clean, marked, 16_000)
    b = evaluate_pair_batch(
        resample(clean, 16_000, 24_000), resample(marked, 16_000, 24_000), 24_000
    )
    assert abs(a["lsd"].mean() - b["lsd"].mean()) < 1.0
    assert abs(a["si_snr_watermarked"].mean() - b["si_snr_watermarked"].mean()) < 2.0
    assert abs(a["stoi"].mean() - b["stoi"].mean()) < 0.02
