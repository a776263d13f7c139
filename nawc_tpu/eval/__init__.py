from .metrics import si_snr, snr, lsd, stoi, si_sdr, pesq_host
from .benchmark import (
    run_detector_checker,
    run_survivability,
    run_combined,
    find_optimal_threshold,
    detection_auc,
    DEFAULT_THRESHOLDS,
)
from .robustness import (
    run_robustness,
    chunk_audio,
    write_results_csv,
    overall_stats,
    stats_by_attack,
)
from .quality import evaluate_pairs, evaluate_pair_batch, make_pairs
from . import reporting

__all__ = [
    "si_snr", "snr", "lsd", "stoi", "si_sdr", "pesq_host",
    "run_detector_checker", "run_survivability", "run_combined",
    "find_optimal_threshold", "detection_auc", "DEFAULT_THRESHOLDS",
    "run_robustness", "chunk_audio", "write_results_csv",
    "overall_stats", "stats_by_attack",
    "evaluate_pairs", "evaluate_pair_batch", "make_pairs",
    "reporting",
]
