"""Hamming(12,8) single-error-correcting code over GF(2).

Protects the psychoacoustic watermark's exact-match payload: one flipped
bit per 8-bit symbol is corrected, which turns per-symbol error rate p into
~binom(12,2) p^2 — the difference between exact-match surviving attacks or
not (docs/roadmap.md item 4).

Layout: 12-bit codeword, parity bits at 1-indexed positions 1,2,4,8 covering
the standard Hamming index sets; data bits fill the remaining positions in
order.  The 4-bit syndrome equals the 1-indexed position of a single error
(0 = clean).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_N, _K = 12, 8
_PARITY_POS = (1, 2, 4, 8)  # 1-indexed
_DATA_POS = tuple(p for p in range(1, _N + 1) if p not in _PARITY_POS)


def _parity_checks() -> np.ndarray:
    """(4, 12) check matrix: row r covers positions with bit r set."""
    h = np.zeros((4, _N), np.int32)
    for r in range(4):
        for pos in range(1, _N + 1):
            if pos & (1 << r):
                h[r, pos - 1] = 1
    return h


_H = _parity_checks()


def hamming_encode(data: jnp.ndarray) -> jnp.ndarray:
    """(..., 8) data bits -> (..., 12) codeword bits."""
    shape = data.shape[:-1]
    cw = jnp.zeros(shape + (_N,), jnp.int32)
    for i, pos in enumerate(_DATA_POS):
        cw = cw.at[..., pos - 1].set(data[..., i])
    h = jnp.asarray(_H)
    for r, ppos in enumerate(_PARITY_POS):
        # parity over covered positions excluding the parity bit itself
        mask = h[r].at[ppos - 1].set(0)
        par = jnp.sum(cw * mask, axis=-1) % 2
        cw = cw.at[..., ppos - 1].set(par)
    return cw


def _all_codewords() -> np.ndarray:
    """(256, 12) codeword table enumerated by data byte (big-endian bits).

    Pure numpy: module import must not dispatch device ops (the axon TPU
    backend makes import-time jnp calls remote serial compiles)."""
    bytes_ = np.arange(256)
    data = (bytes_[:, None] >> np.arange(7, -1, -1)) & 1  # (256, 8)
    cw = np.zeros((256, _N), np.int32)
    for i, pos in enumerate(_DATA_POS):
        cw[:, pos - 1] = data[:, i]
    for r, ppos in enumerate(_PARITY_POS):
        mask = _H[r].copy()
        mask[ppos - 1] = 0
        cw[:, ppos - 1] = (cw * mask).sum(axis=-1) % 2
    return cw


_CODEWORDS = _all_codewords()


def hamming_soft_decode(llr: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Maximum-likelihood soft decoding: (..., 12) soft statistics (positive
    = bit 1, magnitude = confidence) -> ((..., 8) data bits, (...,) byte).

    Correlates against all 256 codewords (a tiny matmul — MXU-friendly) and
    picks the best.  Unlike syndrome decoding (which MIS-corrects double
    errors, d_min=3), ML uses bit confidences, so two low-|z| flips in one
    symbol usually still decode correctly."""
    cw = jnp.asarray(2.0 * _CODEWORDS - 1.0, llr.dtype)  # (256, 12) ±1
    score = jnp.einsum("...n,kn->...k", llr, cw)
    byte = jnp.argmax(score, axis=-1)  # (...,)
    shifts = jnp.arange(7, -1, -1)
    data = (byte[..., None] >> shifts) & 1
    return data.astype(jnp.int32), byte


def hamming_decode(code: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(..., 12) received bits -> ((..., 8) corrected data,
    (...,) n_corrected in {0,1})."""
    h = jnp.asarray(_H)
    syndrome = jnp.stack(
        [jnp.sum(code * h[r], axis=-1) % 2 for r in range(4)], axis=-1
    )  # (..., 4)
    err_pos = jnp.sum(syndrome * jnp.asarray([1, 2, 4, 8]), axis=-1)  # (...,)
    # flip the erroneous position (0 = no error; position is 1-indexed)
    onehot = (
        jnp.arange(1, _N + 1) == err_pos[..., None]
    ).astype(jnp.int32)  # (..., 12)
    corrected = (code + onehot) % 2
    data = jnp.stack([corrected[..., pos - 1] for pos in _DATA_POS], axis=-1)
    return data, (err_pos > 0).astype(jnp.int32)
