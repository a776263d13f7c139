"""Fused codebook nearest-neighbor lookup (the RVQ hot op) as a Pallas TPU
kernel, with a jnp reference implementation for CPU and for testing.

In the reference this work happens inside the pip ``snac`` package's quantizer
(exercised at ``watermark_testing.py:256-260`` and
``run_snac_layer_ablation.py:115-123``); BASELINE.json's north star calls for
the codebook lookup to fuse on-chip with the codec forward.  The kernel tiles
frames over a grid, keeps the whole (K, D) codebook resident in VMEM, computes
the (tile, K) score matrix on the MXU, and reduces to per-frame argmax codes.

Lookup metric: cosine similarity over L2-normalized vectors (DAC/SNAC-style
normalized codebook lookup), equivalent to euclidean NN on the unit sphere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 256  # frames per grid step
_LANE = 128  # pad codebook dim to the TPU lane width


def _l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-8) -> jnp.ndarray:
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)


def nearest_codebook_reference(z: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """(N, D), (K, D) -> (N,) int32 nearest (cosine) codebook indices."""
    zn = _l2_normalize(z)
    cn = _l2_normalize(codebook)
    scores = jnp.dot(zn, cn.T, preferred_element_type=jnp.float32)
    return jnp.argmax(scores, axis=-1).astype(jnp.int32)


def _lookup_kernel(z_ref, cb_ref, codes_ref):
    # z_ref: (TILE, LANE) normalized frames; cb_ref: (K, LANE) normalized
    # codebook; codes_ref: (1, TILE) int32 output.
    scores = jnp.dot(
        z_ref[:], cb_ref[:].T, preferred_element_type=jnp.float32
    )  # (TILE, K) on the MXU
    # manual argmax (first max index): Mosaic lowers max+iota+min cleanly
    k = scores.shape[-1]
    m = jnp.max(scores, axis=-1, keepdims=True)
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    codes = jnp.min(jnp.where(scores >= m, col, k), axis=-1)  # (TILE,)
    codes_ref[pl.program_id(0), :] = codes


@functools.partial(jax.jit, static_argnames=("interpret",))
def _nearest_codebook_pallas(z: jnp.ndarray, codebook: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    n, d = z.shape
    k = codebook.shape[0]
    zn = _l2_normalize(z)
    cn = _l2_normalize(codebook)
    # pad feature dim to lane width, frames to tile multiple
    dp = max(_LANE, -(-d // _LANE) * _LANE)
    zn = jnp.pad(zn, ((0, (-n) % _TILE), (0, dp - d)))
    cn = jnp.pad(cn, ((0, 0), (0, dp - d)))
    g = zn.shape[0] // _TILE
    codes = pl.pallas_call(
        _lookup_kernel,
        out_shape=jax.ShapeDtypeStruct((g, _TILE), jnp.int32),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((_TILE, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        # full-array output block (row-per-step writes): a (1, TILE) block
        # would violate the (8, 128) min-tile rule for int32
        out_specs=pl.BlockSpec((g, _TILE), lambda i: (0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * zn.shape[0] * k * dp,
            bytes_accessed=zn.size * 4 + cn.size * 4 + zn.shape[0] * 4,
            transcendentals=0,
        ),
    )(zn, cn)
    return codes.reshape(-1)[:n]


def nearest_codebook(
    z: jnp.ndarray, codebook: jnp.ndarray, use_pallas: bool | None = None
) -> jnp.ndarray:
    """Nearest-codebook indices for a batch of frames.

    Args:
      z: (..., D) query vectors (any leading shape; flattened internally).
      codebook: (K, D) codebook.
      use_pallas: force kernel on/off; default = on iff running on TPU.

    Returns:
      (...,) int32 codes.
    """
    lead = z.shape[:-1]
    # codes are discrete: no gradient flows through the lookup (the STE in
    # VQLevel handles training); stop_gradient also keeps jax.grad from
    # trying to linearize through pallas_call.
    zf = jax.lax.stop_gradient(z.reshape(-1, z.shape[-1]))
    codebook = jax.lax.stop_gradient(codebook)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        codes = _nearest_codebook_pallas(zf, codebook)
    else:
        codes = nearest_codebook_reference(zf, codebook)
    return codes.reshape(lead)
