"""Fused multi-level residual-VQ encode as ONE Pallas TPU kernel.

The un-fused path (``codec/model.py: ResidualVQ.encode``) round-trips the
residual, projections, scores and dequantized contributions through HBM
between every VQ level.  This kernel keeps a tile of latent frames resident
in VMEM and runs the whole chain per level — pool(stride) -> in_proj ->
cosine scores (MXU) -> argmax -> one-hot dequantize (MXU, no gathers) ->
out_proj -> residual subtract — for all ``vq_strides`` levels before
touching HBM again.  Codebooks are passed TRANSPOSED (cb_dim, K): at
codebook_dim 8 that is a (8, 4096) = 128 KB VMEM block per table instead of
the 2 MB a (4096, 8) layout pads to, and both matmuls contract without any
in-kernel transpose.

Reference behavior being fused: the pip ``snac`` quantizer chain the
reference drives at ``watermark_testing.py:256-260`` and
``run_snac_layer_ablation.py:115-123`` (hierarchical codes at strides 4/2/1).
Exactness vs the unfused module path is tested in
``tests/test_rvq_fused.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 256  # full-rate latent frames per grid step (multiple of max stride)
_LANE = 128


def _l2n(x: jnp.ndarray, axis: int = -1, eps: float = 1e-8) -> jnp.ndarray:
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)


def level_params(params, i: int):
    """Extract one VQ level's tables from a codec param tree."""
    lvl = params["params"]["quantizer"][f"level_{i}"]
    return (lvl["in_proj"]["kernel"], lvl["in_proj"]["bias"],
            lvl["out_proj"]["kernel"], lvl["out_proj"]["bias"],
            lvl["codebook"])


def rvq_encode_reference(z: jnp.ndarray, params, strides) -> list[jnp.ndarray]:
    """Pure-jnp mirror of ResidualVQ.encode (codec/model.py) on a raw param
    tree; the exactness target for the kernel."""
    res = z
    codes_out = []
    for i, s in enumerate(strides):
        in_k, in_b, out_k, out_b, cb = level_params(params, i)
        b, t, d = res.shape
        pooled = res.reshape(b, t // s, s, d).mean(axis=2) if s > 1 else res
        z_e = pooled @ in_k + in_b
        scores = _l2n(z_e) @ _l2n(cb).T
        codes = jnp.argmax(scores, axis=-1).astype(jnp.int32)
        out = jnp.take(cb, codes, axis=0) @ out_k + out_b
        if s > 1:
            out = jnp.repeat(out, s, axis=1)
        res = res - out
        codes_out.append(codes)
    return codes_out


def _fused_kernel(strides, k, z_ref, ink_ref, inb_ref, outk_ref, outb_ref,
                  cbn_ref, cbr_ref, *codes_refs):
    # one output row per grid step per level (dynamic-row writes into a
    # full-array block are the Mosaic-supported pattern; dynamic LANE
    # offsets must be 128-aligned, which tl=64 tiles are not)
    row = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    res = z_ref[0]  # (TILE, Dp)
    for lvl, s in enumerate(strides):
        tl = _TILE // s
        pooled = res.reshape(tl, s, res.shape[-1]).mean(axis=1) if s > 1 else res
        z_e = (
            jnp.dot(pooled, ink_ref[lvl], preferred_element_type=jnp.float32)
            + inb_ref[lvl][None, :]
        )  # (tl, cbd)
        scores = jnp.dot(
            _l2n(z_e), cbn_ref[lvl], preferred_element_type=jnp.float32
        )  # (tl, K) on the MXU
        m = jnp.max(scores, axis=-1, keepdims=True)
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        codes = jnp.min(jnp.where(scores >= m, col, k), axis=-1)  # (tl,)
        onehot = (col == codes[:, None]).astype(jnp.float32)  # (tl, K)
        # dequantize without gathers: z_q^T = cb^T @ onehot^T, then project
        # straight to latent dim by contracting cb_dim on both sides
        z_qt = jax.lax.dot_general(
            cbr_ref[lvl], onehot, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (cbd, tl)
        out = (
            jax.lax.dot_general(
                z_qt, outk_ref[lvl], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + outb_ref[lvl][None, :]
        )  # (tl, Dp)
        if s > 1:
            out = jnp.repeat(out, s, axis=0)
        res = res - out
        codes_refs[lvl][row, :] = codes


@functools.partial(jax.jit, static_argnames=("strides", "interpret"))
def _rvq_encode_pallas(z, ink, inb, outk, outb, cbn, cbr, strides,
                       interpret=False):
    b, t, d = z.shape
    nl, _, k = cbn.shape
    dp = -(-d // _LANE) * _LANE
    tp = -(-t // _TILE) * _TILE
    z = jnp.pad(z, ((0, 0), (0, tp - t), (0, dp - d)))
    ink = jnp.pad(ink, ((0, 0), (0, dp - d), (0, 0)))
    outk = jnp.pad(outk, ((0, 0), (0, 0), (0, dp - d)))
    outb = jnp.pad(outb, ((0, 0), (0, dp - d)))
    nt = tp // _TILE
    cbd = cbn.shape[1]

    def full(*shape):
        return pl.BlockSpec(shape, lambda bb, ii: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    codes = pl.pallas_call(
        functools.partial(_fused_kernel, strides, k),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, _TILE, dp), lambda bb, ii: (bb, ii, 0), memory_space=pltpu.VMEM),
            full(nl, dp, cbd),   # in_proj kernels
            full(nl, cbd),       # in_proj biases
            full(nl, cbd, dp),   # out_proj kernels
            full(nl, dp),        # out_proj biases
            full(nl, cbd, k),    # normalized-transposed codebooks (scores)
            full(nl, cbd, k),    # raw-transposed codebooks (dequantize)
        ],
        # full-array output blocks, one row per (batch, tile) grid step —
        # a (1, tl) block would violate the (8, 128) min-tile rule for int32
        out_specs=[full(b * nt, _TILE // s) for s in strides],
        out_shape=[jax.ShapeDtypeStruct((b * nt, _TILE // s), jnp.int32) for s in strides],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * sum((tp // s) * (d * cbn.shape[1] * 2 + cbn.shape[1] * k * 2) for s in strides),
            bytes_accessed=z.size * 4 + (cbn.size + cbr.size) * 4,
            transcendentals=0,
        ),
    )(z, ink, inb, outk, outb, cbn, cbr)
    return [c.reshape(b, tp // s)[:, : t // s] for c, s in zip(codes, strides)]


def rvq_encode_fused(z: jnp.ndarray, params, strides,
                     use_pallas: bool | None = None) -> list[jnp.ndarray]:
    """Full residual-VQ encode: z (B, T', D) -> per-level codes
    [(B, T'/s_i) int32].  ``params`` is the codec param tree.

    T' must divide by every stride (guaranteed by the codec's pad-to-chunk
    rule).  Uses the fused Pallas kernel on TPU, the jnp reference elsewhere.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas:
        return rvq_encode_reference(z, params, strides)
    ink, inb, outk, outb, cbn, cbr = [], [], [], [], [], []
    for i in range(len(strides)):
        k_, b_, ok_, ob_, cb_ = level_params(params, i)
        ink.append(k_)
        inb.append(b_)
        outk.append(ok_)
        outb.append(ob_)
        cbn.append(_l2n(cb_).T)
        cbr.append(cb_.T)
    stack = lambda xs: jnp.stack([jax.lax.stop_gradient(x) for x in xs])
    return _rvq_encode_pallas(
        jax.lax.stop_gradient(z), stack(ink), stack(inb), stack(outk),
        stack(outb), stack(cbn), stack(cbr), tuple(strides))
