"""Parameter checkpointing (flax serialization; no training -> no checkpoints
in the reference, SURVEY.md §5 — this is new capability for our train loop)."""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
from flax import serialization


def save_params(path: str | Path, params: Any) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    data = serialization.to_bytes(jax.device_get(params))
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(data)
    tmp.replace(path)


def load_params(path: str | Path, template: Any) -> Any:
    """Restore into the structure of `template` (e.g. fresh init)."""
    data = Path(path).read_bytes()
    return serialization.from_bytes(template, data)
