"""Eval harness: detector-checker, survivability grid, optimal threshold,
robustness runner with raw_bench schema, quality pipeline (component C1,
C14-C16, C28-C29)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nawc_tpu.eval import (
    detection_auc,
    evaluate_pair_batch,
    find_optimal_threshold,
    overall_stats,
    run_combined,
    run_detector_checker,
    run_robustness,
    run_survivability,
    stats_by_attack,
    chunk_audio,
)
from nawc_tpu.models import ChunkedWM, SpreadSpectrumWM


@pytest.fixture(scope="module")
def wms():
    return {"spread_spectrum": SpreadSpectrumWM(), "chunked": ChunkedWM()}


@pytest.fixture(scope="module")
def attacks():
    return {
        "identity": lambda w, k: w,
        "noise": lambda w, k: w + 0.001 * jax.random.normal(k, w.shape),
        "erase": lambda w, k: w * 0.0,
    }


def test_detector_checker(librispeech_16k, wms):
    df = run_detector_checker(wms, librispeech_16k[:4])
    ok = df[df.clip_index >= 0]
    assert set(ok.watermark) == set(wms)
    assert ok.detector_works.mean() > 0.8
    assert (ok.score_after > ok.score_before).mean() > 0.9


def test_survivability_grid(librispeech_16k, wms, attacks):
    df = run_survivability(wms, attacks, librispeech_16k[:4])
    ok = df[df.clip_index >= 0]
    assert len(ok) == 2 * 3 * 4
    by = ok.groupby("attack")["survived"].mean()
    assert by["identity"] > 0.8
    assert by["erase"] < 0.2


def test_survivability_error_isolation(librispeech_16k, wms):
    def bad_attack(w, k):
        raise RuntimeError("boom")

    df = run_survivability(wms, {"bad": bad_attack, "id": lambda w, k: w}, librispeech_16k[:2])
    assert (df[df.attack == "bad"].clip_index == -1).all()  # ERROR rows
    assert (df[(df.attack == "id") & (df.clip_index >= 0)].survived).mean() > 0.8


def test_optimal_threshold_and_auc():
    scores = np.array([0.1, 0.2, 0.3, 0.7, 0.8, 0.9])
    labels = np.array([0, 0, 0, 1, 1, 1])
    t, acc = find_optimal_threshold(scores, labels)
    assert acc == 1.0
    assert 0.3 <= t < 0.7
    assert detection_auc(scores, labels) == 1.0


def test_combined_report(librispeech_16k, wms, attacks):
    rep = run_combined(wms, attacks, librispeech_16k[:4])
    assert set(rep.summary.watermark) == set(wms)
    assert (rep.summary.auc > 0.8).all()


def test_chunking():
    x = np.arange(70_000, dtype=np.float32)
    chunks, idx = chunk_audio(x, 16_000, 2.0)
    assert chunks.shape == (2, 32_000)
    np.testing.assert_array_equal(idx, [0, 1])
    short, idx2 = chunk_audio(np.ones(5_000, np.float32), 16_000, 2.0)
    assert short.shape == (1, 32_000)


def test_robustness_schema(librispeech_16k, attacks):
    wm = SpreadSpectrumWM()
    clips = [np.asarray(librispeech_16k[i]) for i in range(3)]
    df = run_robustness(wm, attacks, clips, 16_000, chunk_seconds=2.0)
    expected = {
        "clip_index", "chunk_index", "attack_type",
        "bitwise/clean", "bitwise/distorted",
        "bitwise/no_watermark_clean", "bitwise/no_watermark_distorted",
        "hard/clean", "hard/distorted",
        "hard/no_watermark_clean", "hard/no_watermark_distorted",
        "sisnr_wm", "sisnr_attack",
    }
    assert expected <= set(df.columns)
    assert len(df) == 3 * len(attacks)
    ident = df[df.attack_type == "identity"]
    assert ident["bitwise/clean"].mean() > 0.95
    assert ident["hard/clean"].mean() > 0.9
    # no-watermark bit accuracy should hover at chance
    assert abs(df["bitwise/no_watermark_clean"].mean() - 0.5) < 0.2
    ov = overall_stats(df)
    assert "bitwise/clean_mean" in ov.columns and "n" in ov.columns
    ba = stats_by_attack(df)
    assert set(ba.attack_type) == set(attacks)


def test_quality_batch(librispeech_16k):
    wm = SpreadSpectrumWM()
    from nawc_tpu.models import random_message

    msg = random_message(jax.random.PRNGKey(0), 4, 16)
    marked = wm.embed(librispeech_16k[:4], msg)
    cols = evaluate_pair_batch(librispeech_16k[:4], marked, 16_000)
    assert set(cols) == {"si_snr_clean", "si_snr_watermarked", "delta_si_snr", "snr", "lsd", "stoi", "lsd_native", "stoi_dev"}
    assert (cols["si_snr_clean"] > 60).all()
    assert (cols["si_snr_watermarked"] > 15).all()
    assert (cols["stoi"] > 0.85).all()
    assert (cols["lsd"] < 12).all()


def test_error_only_methods_flagged():
    """The benchmark CLI must fail loudly when a method yields only ERROR
    rows (ADVICE r2: round-2 shipped MosaicError CSVs as evidence)."""
    import pandas as pd

    from nawc_tpu.cli.benchmark import _error_only_methods

    df = pd.DataFrame([
        {"watermark": "ok", "clip_index": 0, "score": 0.9, "error": None},
        {"watermark": "broken", "clip_index": -1, "error": "MosaicError(...)"},
        {"watermark": "broken", "clip_index": -1, "error": "MosaicError(...)"},
    ])
    assert _error_only_methods(df, ["ok", "broken"]) == ["broken"]
    assert _error_only_methods(df.drop(columns=["error"]), ["ok"]) == []


def test_load_audio_clips_native_length():
    """Round-5 fix: the robustness runner must not fabricate silence chunks
    by zero-padding short clips to the crop length (139/496 chunks of the
    r4-era sweep were pure padding)."""
    from nawc_tpu.cli.common import load_audio_clips

    clips = load_audio_clips(
        "/root/reference/dataset/LibriSpeech/*.wav", 6, 16_000, 8.0)
    assert len(clips) == 6
    lens = [len(c) for c in clips]
    assert all(l <= 8 * 16_000 for l in lens)
    assert len(set(lens)) > 1  # native lengths, not one padded crop
    # no trailing fabricated silence on a short clip
    short = min(clips, key=len)
    assert np.abs(short[-1600:]).max() > 0
