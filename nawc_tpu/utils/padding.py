"""Static-shape padding and masking utilities.

TPU/XLA wants static shapes; the reference instead pads each clip individually
inside every embed/attack call (pad-to-4096 at ``watermark_testing.py:301-303``
and 8 more sites).  Here padding is explicit, mask-carrying, and usable under
jit with static pad targets.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def padded_length(length: int, multiple: int) -> int:
    """Smallest multiple of `multiple` >= length (python ints, trace-time)."""
    return int(-(-length // multiple) * multiple)


def pad_to_multiple(x: jnp.ndarray, multiple: int, axis: int = -1) -> jnp.ndarray:
    """Right-pad `x` with zeros along `axis` to a multiple of `multiple`."""
    size = x.shape[axis]
    target = padded_length(size, multiple)
    return pad_axis_to(x, target, axis=axis)


def pad_axis_to(x: jnp.ndarray, target: int, axis: int = -1) -> jnp.ndarray:
    """Right-pad with zeros (or truncate) `axis` to exactly `target`."""
    size = x.shape[axis]
    if size == target:
        return x
    if size > target:
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, target)
        return x[tuple(sl)]
    pads = [(0, 0)] * x.ndim
    pads[axis if axis >= 0 else x.ndim + axis] = (0, target - size)
    return jnp.pad(x, pads)


def length_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) int lengths -> (B, max_len) float {0,1} validity mask."""
    pos = jnp.arange(max_len)[None, :]
    return (pos < lengths[:, None]).astype(jnp.float32)


def fix_length(x: jnp.ndarray, target: int, axis: int = -1) -> jnp.ndarray:
    """Trim-or-pad to an exact length (the reference's post-attack length
    fix-up, ``watermark_testing.py:70-79``)."""
    return pad_axis_to(x, target, axis=axis)


def bucket_length(length: int, buckets: tuple[int, ...]) -> int:
    """Pick the smallest bucket >= length (host-side; limits recompilation)."""
    for b in buckets:
        if length <= b:
            return b
    return padded_length(length, buckets[-1])


def ensure_mono_np(wav: np.ndarray) -> np.ndarray:
    """Collapse (C, T) or (T, C) numpy audio to mono (T,) by channel mean.

    Behavioral analogue of ``ensure_mono`` (``watermark_testing.py:21-29``).
    """
    wav = np.asarray(wav)
    if wav.ndim == 1:
        return wav
    if wav.ndim == 2:
        # channels-first if first dim is small
        if wav.shape[0] <= 8 and wav.shape[0] < wav.shape[1]:
            return wav.mean(axis=0)
        return wav.mean(axis=1)
    raise ValueError(f"unsupported audio shape {wav.shape}")
