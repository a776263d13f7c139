"""Fused whiten+correlate for the spread-spectrum detector as a Pallas TPU
kernel, with a jnp reference implementation for CPU and for testing.

This is the detector's hot path (the capability analogue of the reference's
AudioSeal ``detect``, ``watermark_testing.py:106-111``): given the band
residual r (B, T, W) it per-bin whitens over time and correlates against the
K secret PN patterns plus 6 time-rolled null variants (the self-calibration
statistic, see ``models/spread_spectrum.py``).

The XLA version materializes the whitened residual in HBM and runs 7
separate einsums over it (one per pattern variant).  The kernel exploits a
cancellation to do it in one pass:

  The PN patterns are time-centered (sum_t p[t, w] = 0 for every bin w, and
  a cyclic time-roll preserves that), so the per-bin mean subtraction and
  the global mean subtraction in the whitening both vanish inside the
  correlation:  sum_tw ((r - mu_w - c) / s_w) p = sum_tw (r / s_w) p.
  Whitening therefore reduces to a per-bin SCALING by 1 / (std_w + 0.2).

Per grid step (b, j) the kernel computes the scaled residual once (at j==0,
kept in VMEM scratch across the j steps), then one MXU contraction against
pattern variant j.  The whitened residual never touches HBM and the 7
passes collapse into one.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_VMEM_PATTERN_BUDGET = 8 * 1024 * 1024  # bytes; above this fall back to jnp


def _center_time(p: jnp.ndarray) -> jnp.ndarray:
    return p - jnp.mean(p, axis=-2, keepdims=True)


def whiten_correlate_reference(
    r: jnp.ndarray, p: jnp.ndarray, null_offsets: tuple[int, ...]
) -> jnp.ndarray:
    """(B, T, W) residual, (K, T, W) patterns -> (B, K) calibrated z stats.

    The original detector math, kept verbatim as the CPU path and the
    exactness oracle for the kernel (``models/spread_spectrum.py`` detect).
    """
    mu = jnp.mean(r, axis=-2, keepdims=True)
    sd = jnp.std(r, axis=-2, keepdims=True)
    rw = (r - mu) / (sd + 0.2)
    pc = _center_time(p)
    rw = rw - jnp.mean(rw, axis=(-2, -1), keepdims=True)
    corr = jnp.einsum("btw,ktw->bk", rw, pc)
    nulls = jnp.stack(
        [jnp.einsum("btw,ktw->bk", rw, jnp.roll(pc, o, axis=-2)) for o in null_offsets],
        axis=-1,
    )
    sigma = jnp.sqrt(jnp.mean(nulls**2, axis=(-2, -1)))
    return corr / (sigma[:, None] + 1e-8)


def _kernel(t_true: int, r_ref, p_ref, out_ref, rs_ref):
    b, j = pl.program_id(0), pl.program_id(1)

    @pl.when(j == 0)
    def _():
        # per-bin scale from time statistics; padded rows/bins are zero and
        # contribute nothing (sums unchanged, scaled residual stays 0)
        r = r_ref[0]
        mu = jnp.sum(r, axis=0, keepdims=True) / t_true
        ms = jnp.sum(r * r, axis=0, keepdims=True) / t_true
        sd = jnp.sqrt(jnp.maximum(ms - mu * mu, 0.0))
        rs_ref[:] = r * pl.reciprocal(sd + 0.2, approx=False)

    # (K, T, W) x (T, W) contraction; K is tiny (<= 16) so the VPU
    # multiply+reduce is the right unit — the win is the single fused pass,
    # not MXU occupancy
    k = p_ref.shape[1]
    corr = jnp.sum(p_ref[0] * rs_ref[:][None, :, :], axis=(1, 2))  # (K,)
    out_ref[b, pl.ds(j * _LANE, _LANE)] = jnp.pad(corr, (0, _LANE - k))


@functools.partial(jax.jit, static_argnames=("null_offsets", "interpret"))
def _whiten_correlate_pallas(
    r: jnp.ndarray,
    p: jnp.ndarray,
    null_offsets: tuple[int, ...],
    interpret: bool = False,
) -> jnp.ndarray:
    b, t, w = r.shape
    k = p.shape[0]
    assert k <= _LANE, "pattern count exceeds one lane tile"
    pc = _center_time(p)
    # variant 0 = true patterns, 1.. = time-rolled nulls (roll preserves the
    # time-centering the cancellation depends on)
    pstack = jnp.stack([pc] + [jnp.roll(pc, o, axis=-2) for o in null_offsets])
    nv = pstack.shape[0]

    bp = -(-b // 8) * 8  # sublane-align the output rows
    tp = -(-t // 8) * 8
    wpad = -(-w // _LANE) * _LANE
    r = jnp.pad(r, ((0, bp - b), (0, tp - t), (0, wpad - w)))
    pstack = jnp.pad(pstack, ((0, 0), (0, 0), (0, tp - t), (0, wpad - w)))

    out = pl.pallas_call(
        functools.partial(_kernel, t),
        out_shape=jax.ShapeDtypeStruct((bp, nv * _LANE), jnp.float32),
        grid=(bp, nv),
        in_specs=[
            pl.BlockSpec((1, tp, wpad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, tp, wpad), lambda i, j: (j, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bp, nv * _LANE), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tp, wpad), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * nv * k * tp * wpad,
            bytes_accessed=(bp + nv * k) * tp * wpad * 4 + bp * nv * _LANE * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(r, pstack)

    out = out.reshape(bp, nv, _LANE)[:b, :, :k]  # (B, 1+nulls, K)
    corr, nulls = out[:, 0], out[:, 1:]
    sigma = jnp.sqrt(jnp.mean(nulls**2, axis=(-2, -1)))
    return corr / (sigma[:, None] + 1e-8)


def whiten_correlate(
    r: jnp.ndarray,
    p: jnp.ndarray,
    null_offsets: tuple[int, ...],
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Self-calibrated detector statistics.

    Args:
      r: (B, T, W) band residual (log-magnitude minus spectral envelope).
      p: (K, T, W) +-1 PN patterns, already tiled to T frames.
      null_offsets: static frame rolls whose correlations sample the null.
      use_pallas: force kernel on/off; default = on iff running on TPU and
        the pattern block fits the VMEM budget.

    Returns:
      (B, K) z statistics, ~N(0, 1) per bit on unmarked audio.
    """
    if use_pallas is None:
        k, t, w = p.shape
        tp, wpad = -(-t // 8) * 8, -(-w // _LANE) * _LANE
        fits = k * tp * wpad * 4 <= _VMEM_PATTERN_BUDGET
        use_pallas = jax.default_backend() == "tpu" and fits
    if use_pallas:
        return _whiten_correlate_pallas(r, p, tuple(null_offsets))
    return whiten_correlate_reference(r, p, tuple(null_offsets))
