"""Serving pipeline: ragged clips round-trip through bucketed batches."""

import numpy as np
import jax
import pytest

from nawc_tpu.models import SpreadSpectrumWM, random_message, bit_accuracy
from nawc_tpu.runtime import WatermarkService


def test_ragged_embed_detect(librispeech_16k):
    wm = SpreadSpectrumWM()
    svc = WatermarkService(wm, buckets=(16_000, 32_000), max_batch=4)
    lens = [12_345, 16_000, 20_000, 32_000, 31_999]
    clips = [np.asarray(librispeech_16k[i % 8][:t]) for i, t in enumerate(lens)]
    msgs = np.asarray(random_message(jax.random.PRNGKey(0), len(clips), wm.n_bits))
    marked = svc.embed(clips, msgs)
    assert [len(m) for m in marked] == lens
    presence, bits = svc.detect(marked)
    assert presence.shape == (5,)
    acc = (bits == msgs).mean(axis=-1)
    assert acc.mean() > 0.9, acc
    assert (presence > 0.6).all(), presence
    # unmarked clips stay cold
    p0, _ = svc.detect(clips)
    assert (p0 < 0.4).all(), p0


def test_bucket_grouping():
    wm = SpreadSpectrumWM()
    svc = WatermarkService(wm, buckets=(1000, 2000), max_batch=8)
    clips = [np.zeros(500), np.zeros(1500), np.zeros(2500), np.zeros(999)]
    groups = svc._group(clips)
    assert set(groups) == {1000, 2000, 4000}
    assert groups[1000] == [0, 3]
