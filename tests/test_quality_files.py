"""File-based quality pipeline + artifact writers (C28-C29 file surfaces)."""

import numpy as np
import jax
import pytest

from nawc_tpu.eval import evaluate_pairs, make_pairs
from nawc_tpu.eval.reporting import plot_ablation_heatmap, save_artifacts
from nawc_tpu.models import SpreadSpectrumWM, random_message
from nawc_tpu.utils import audio_io


@pytest.fixture()
def artifact_tree(tmp_path, librispeech_16k):
    wm = SpreadSpectrumWM()
    msg = random_message(jax.random.PRNGKey(0), 2, wm.n_bits)
    marked = wm.embed(librispeech_16k[:2], msg)
    for i in range(2):
        save_artifacts(
            tmp_path, f"clip_{i}",
            np.asarray(librispeech_16k[i]), np.asarray(marked[i]),
            np.asarray(marked[i]), 16_000,
        )
    return tmp_path


def test_artifacts_written(artifact_tree):
    for i in range(2):
        d = artifact_tree / f"clip_{i}"
        assert (d / "1_original.wav").exists()
        assert (d / "2_watermarked.wav").exists()
        assert (d / "3_attacked.wav").exists()
        assert (d / "comparison.png").stat().st_size > 1000
    # artifacts re-read correctly
    a, sr = audio_io.read_wav(artifact_tree / "clip_0" / "2_watermarked.wav")
    assert sr == 16_000 and a.shape[1] == 32_000


def test_make_pairs_and_evaluate(artifact_tree):
    pairs = make_pairs(artifact_tree)
    assert len(pairs) == 2
    df = evaluate_pairs(pairs, sr=16_000, with_pesq=False)
    expected_cols = {"clean", "watermarked", "attack", "instrument",
                     "si_snr_clean", "si_snr_watermarked", "delta_si_snr",
                     "snr", "lsd", "stoi"}
    assert expected_cols <= set(df.columns)
    # watermark at ~22 dB should survive the 16-bit WAV round trip
    assert (df.si_snr_watermarked > 15).all()
    assert (df.stoi > 0.85).all()


def test_ablation_heatmap_plot(tmp_path):
    import pandas as pd

    df = pd.DataFrame({
        "mask": ["full_all", "full_all", "keep_only_0", "keep_only_0"],
        "watermark": ["a", "b", "a", "b"],
        "score": [0.9, 0.8, 0.2, 0.4],
    })
    out = tmp_path / "hm.png"
    plot_ablation_heatmap(df, out)
    assert out.stat().st_size > 1000


def test_quality_summary_aggregation(tmp_path, capsys):
    """--summarize_dir builds the BASELINE-style six-method table."""
    import pandas as pd

    from nawc_tpu.cli.quality import summarize_quality_dir

    for name, si in [("AudioSeal", 26.4), ("SilentCipher", 48.7)]:
        pd.DataFrame({
            "si_snr_watermarked": [si, si + 1.0],
            "snr": [si, si], "lsd": [9.0, 9.2],
            "stoi": [0.99, 0.999], "pesq": [float("nan")] * 2,
        }).to_csv(tmp_path / f"{name}_quality_results.csv", index=False)
    summarize_quality_dir(str(tmp_path))
    out = pd.read_csv(tmp_path / "quality_summary.csv")
    assert list(out["method"]) == ["AudioSeal", "SilentCipher"]
    assert out["n_pairs"].tolist() == [2, 2]
    np.testing.assert_allclose(out["si_snr_wm_db"], [26.9, 49.2])
    assert out["pesq"].isna().all()
