"""Serving pipeline: variable-length clips -> static-shape bucketed batches.

Production front door for the framework (the reference has no serving story;
this is the TPU-native answer to its per-file scripts).  XLA compiles one
program per (bucket_length, batch_size) pair; incoming clips are grouped by
bucket, right-padded, dispatched as full batches, and outputs are trimmed
back to the original lengths.  Detection statistics are computed on the
padded signal — the spread-spectrum detector's null calibration makes the
padding-invariance explicit (zeros carry no watermark and no noise).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import numpy as np

from ..utils.padding import bucket_length


@dataclasses.dataclass
class WatermarkService:
    """Batched embed/detect over ragged clip lists.

    Args:
      wm: any Watermarker (spread_spectrum, chunked, neural, ...).
      buckets: allowed padded lengths (samples); clips longer than the last
        bucket are padded up to the next multiple of it.
      max_batch: dispatch at most this many clips per device call.
    """

    wm: object
    buckets: tuple[int, ...] = (16_000, 32_000, 64_000, 128_000)
    max_batch: int = 64

    def _group(self, clips: Sequence[np.ndarray]) -> dict[int, list[int]]:
        groups: dict[int, list[int]] = {}
        for i, c in enumerate(clips):
            b = bucket_length(len(c), self.buckets)
            groups.setdefault(b, []).append(i)
        return groups

    def _pad(self, clips: Sequence[np.ndarray], idxs: list[int], b: int) -> np.ndarray:
        out = np.zeros((len(idxs), b), np.float32)
        for row, i in enumerate(idxs):
            c = np.asarray(clips[i], np.float32)
            out[row, : len(c)] = c[:b]
        return out

    def embed(
        self, clips: Sequence[np.ndarray], msgs: np.ndarray, key: jax.Array | None = None
    ) -> list[np.ndarray]:
        """clips (list of (T_i,)) + msgs (N, n_bits) -> marked clips,
        original lengths preserved."""
        key = key if key is not None else jax.random.PRNGKey(0)
        results: list[np.ndarray | None] = [None] * len(clips)
        for b, idxs in self._group(clips).items():
            for s in range(0, len(idxs), self.max_batch):
                chunk = idxs[s : s + self.max_batch]
                batch = self._pad(clips, chunk, b)
                marked = np.asarray(self.wm.embed(batch, msgs[chunk], key))
                for row, i in enumerate(chunk):
                    results[i] = marked[row, : len(clips[i])]
        return results  # type: ignore[return-value]

    def detect(self, clips: Sequence[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
        """-> (presence (N,), bits (N, n_bits))."""
        n = len(clips)
        presence = np.zeros(n, np.float32)
        bits = np.zeros((n, self.wm.n_bits), np.int32)
        for b, idxs in self._group(clips).items():
            for s in range(0, len(idxs), self.max_batch):
                chunk = idxs[s : s + self.max_batch]
                batch = self._pad(clips, chunk, b)
                p, bt = self.wm.detect(batch)
                presence[chunk] = np.asarray(p)
                if self.wm.n_bits:
                    bits[chunk] = np.asarray(bt)
        return presence, bits

    def warmup(self, batch_sizes: Sequence[int] = (1,)) -> None:
        """Precompile every (bucket, batch) program before serving."""
        for b in self.buckets:
            for bs in batch_sizes:
                wav = np.zeros((bs, b), np.float32)
                msgs = np.zeros((bs, max(self.wm.n_bits, 1)), np.int32)[:, : self.wm.n_bits]
                if self.wm.n_bits:
                    jax.block_until_ready(self.wm.embed(wav, msgs))
                jax.block_until_ready(self.wm.detect(wav)[0])
