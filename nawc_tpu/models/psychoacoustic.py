"""Psychoacoustic high-rate watermark (SilentCipher-capability analogue).

The reference's SilentCipher wrapper operates at 44.1 kHz, carries an
integer-symbol message (default [1,2,3,4,5]) and detects by exact message
match (``watermark_testing.py:140-225``); its hardened variant brute-forces
the message length (``lalm_layer_test.py:162-184``).  Here: the message is
k 8-bit symbols protected by a Hamming(12,8) single-error-correcting code
(exact match demands every symbol decode perfectly; SEC turns per-symbol
error rate p into ~O(p^2)), carried by the TF spread-spectrum core at
44.1 kHz in the 0.8-10 kHz band (bins above typical speech/music content
carry no multiplicative watermark but soak up attack noise).  Detect corrects, decodes symbols, and scores the exact-match
indicator; `discover_message_length` finds k without being told.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import SpreadSpectrumConfig
from ..utils.ecc import hamming_encode, hamming_soft_decode
from .base import register
from .spread_spectrum import SpreadSpectrumWM

_DEFAULT_MESSAGE = (1, 2, 3, 4, 5)  # the reference's int message (:162)
_CODED_BITS = 12  # Hamming(12,8) codeword width per 8-bit symbol


def ints_to_bits(msg_ints: jnp.ndarray, bits_per_symbol: int = 8) -> jnp.ndarray:
    """(B, k) ints -> (B, k*bits) {0,1} big-endian per symbol."""
    shifts = jnp.arange(bits_per_symbol - 1, -1, -1)
    bits = (msg_ints[..., None] >> shifts) & 1
    return bits.reshape(msg_ints.shape[0], -1).astype(jnp.int32)


def bits_to_ints(bits: jnp.ndarray, bits_per_symbol: int = 8) -> jnp.ndarray:
    """(B, k*bits) -> (B, k) ints."""
    b = bits.reshape(bits.shape[0], -1, bits_per_symbol)
    weights = 2 ** jnp.arange(bits_per_symbol - 1, -1, -1)
    return jnp.sum(b * weights, axis=-1)


@dataclasses.dataclass(frozen=True)
class PsychoacousticWM:
    """44.1 kHz, k-symbol message, Hamming-protected exact-match detection."""

    n_symbols: int = 5
    bits_per_symbol: int = 8
    seed: int = 2
    # 60 coded bits need per-bit z >~ 3 and SEC absorbs stragglers.
    # alpha 0.22 + level-mask q=0.85 is the round-3 operating point
    # (scripts/scratch/tune_psy4.py): SI-SNR 40.1 dB / LSD 1.08, clean
    # exact-match 1.00, 19-attack survival 0.90 on the anchored suite —
    # the mask spares the top-15% loudest TF bins (~99% of residual
    # energy) so the modulation rides where speech masks it.
    alpha: float = 0.22
    mask_quantile: float = 0.85
    ecc: bool = True
    name: str = "psychoacoustic"

    @property
    def coded_bits_per_symbol(self) -> int:
        return _CODED_BITS if self.ecc else self.bits_per_symbol

    @property
    def cfg(self) -> SpreadSpectrumConfig:
        return SpreadSpectrumConfig(
            sample_rate=44_100,
            n_bits=self.n_symbols * self.coded_bits_per_symbol,
            n_fft=2048,
            hop=512,
            band_lo_hz=800.0,
            band_hi_hz=10_000.0,
            alpha=self.alpha,
            mask_quantile=self.mask_quantile,
        )

    @property
    def sample_rate(self) -> int:
        return 44_100

    @property
    def n_bits(self) -> int:
        """User-facing payload size (data bits; parity is internal)."""
        return self.n_symbols * self.bits_per_symbol

    @property
    def _core(self) -> SpreadSpectrumWM:
        return SpreadSpectrumWM(cfg=self.cfg, seed=self.seed)

    def default_message(self, batch: int) -> jnp.ndarray:
        m = jnp.asarray(_DEFAULT_MESSAGE[: self.n_symbols], jnp.int32)
        return jnp.tile(m[None, :], (batch, 1))

    def _data_bits(self, msg: jnp.ndarray) -> jnp.ndarray:
        """(B, k) ints or (B, n_bits) bits -> (B, k, 8) data bits."""
        bits = msg if msg.shape[-1] == self.n_bits else ints_to_bits(msg, self.bits_per_symbol)
        return bits.reshape(bits.shape[0], self.n_symbols, self.bits_per_symbol)

    @functools.partial(jax.jit, static_argnames=("self",))
    def embed(self, wav: jnp.ndarray, msg: jnp.ndarray | None = None, key: jax.Array | None = None) -> jnp.ndarray:
        """`msg` is (B, n_symbols) ints in [0, 256) or (B, n_bits) data bits."""
        if msg is None:
            msg = self.default_message(wav.shape[0])
        data = self._data_bits(msg)
        coded = hamming_encode(data) if self.ecc else data
        return self._core.embed(wav, coded.reshape(wav.shape[0], -1))

    @functools.partial(jax.jit, static_argnames=("self",))
    def detect(self, wav: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """-> (presence, corrected DATA bits (B, n_bits)).

        Decoding is soft maximum-likelihood per symbol: the detector's
        per-bit z statistics carry confidence, and correlating them against
        all 256 codewords beats syndrome decoding (which mis-corrects double
        errors) — this is what closes the exact-match gap on quiet clips."""
        z = self._core._correlate(wav)  # (B, coded bits), soft
        presence = jax.nn.sigmoid(
            self._core.presence_gain
            * (jnp.mean(jnp.abs(z), axis=-1) - self._core.presence_z0)
        )
        if self.ecc:
            coded = z.reshape(z.shape[0], self.n_symbols, _CODED_BITS)
            data, _ = hamming_soft_decode(coded)
        else:
            data = (z > 0).astype(jnp.int32).reshape(
                z.shape[0], self.n_symbols, self.bits_per_symbol
            )
        return presence, data.reshape(z.shape[0], -1)

    def decode_message(self, wav: jnp.ndarray) -> jnp.ndarray:
        _, bits = self.detect(wav)
        return bits_to_ints(bits, self.bits_per_symbol)

    @functools.partial(jax.jit, static_argnames=("self",))
    def score(self, wav: jnp.ndarray, msg: jnp.ndarray | None = None) -> jnp.ndarray:
        """Exact-match semantic (``watermark_testing.py:196-225``): 1.0 iff
        every symbol decodes correctly (after error correction)."""
        if msg is None:
            msg = self.default_message(wav.shape[0])
        want = self._data_bits(msg).reshape(-1, self.n_bits) if msg.shape[-1] != self.n_bits else msg
        _, bits = self.detect(wav)
        sym_got = bits_to_ints(bits, self.bits_per_symbol)
        sym_want = bits_to_ints(want, self.bits_per_symbol)
        return (sym_got == sym_want).all(axis=-1).astype(jnp.float32)

    def discover_message_length(self, wav: jnp.ndarray, max_symbols: int = 64) -> int:
        """Auto-discover how many symbols are embedded (the reference's
        hardened SilentCipher wrapper brute-forces lengths 1..64,
        ``lalm_layer_test.py:162-184``).

        One pass: coded symbols carrying payload have mean |z| >> 1 while
        unused pattern slots sit at the N(0,1) null (prefix-stable PN)."""
        probe = PsychoacousticWM(
            n_symbols=max_symbols,
            bits_per_symbol=self.bits_per_symbol, seed=self.seed,
            alpha=self.alpha, ecc=self.ecc,
        )
        z = jnp.abs(probe._core._correlate(wav))
        per_symbol = z.reshape(z.shape[0], -1, self.coded_bits_per_symbol).mean(axis=(0, 2))
        live = np.asarray(per_symbol > 2.0)
        n = 0
        for v in live:
            if not v:
                break
            n += 1
        return n


@register("psychoacoustic")
def _build(n_symbols: int = 5, seed: int = 2) -> PsychoacousticWM:
    return PsychoacousticWM(n_symbols=n_symbols, seed=seed)
