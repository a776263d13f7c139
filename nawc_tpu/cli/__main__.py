"""Unified CLI dispatcher: ``python -m nawc_tpu.cli <command> [args...]``."""

from __future__ import annotations

import importlib
import sys

COMMANDS = (
    "benchmark", "robustness", "manifold", "ablation", "uncertainty",
    "quality", "perturbation", "pgd", "stats", "watermark", "train_codec",
    "train_wm", "train_gan", "eval_codec", "sample_data",
)


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help") or sys.argv[1] not in COMMANDS:
        print("usage: python -m nawc_tpu.cli <command> [args...]\n\ncommands:")
        for c in COMMANDS:
            mod = importlib.import_module(f"nawc_tpu.cli.{c}")
            doc = (mod.__doc__ or "").strip().splitlines()[0]
            print(f"  {c:12s} {doc}")
        raise SystemExit(0 if len(sys.argv) >= 2 and sys.argv[1] in ("-h", "--help") else 1)
    cmd = sys.argv[1]
    mod = importlib.import_module(f"nawc_tpu.cli.{cmd}")
    mod.main(sys.argv[2:])


if __name__ == "__main__":
    main()
