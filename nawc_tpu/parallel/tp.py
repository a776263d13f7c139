"""Tensor-parallel RVQ codebook lookup over the "model" mesh axis.

Genuine TP for the codec's hot op: the (K, D) codebook is sharded row-wise
over "model"; each device computes scores against its K/n shard and the
global argmax is recovered by combining (local best score, local best index)
across the axis — one all_gather of two scalars per frame, riding ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _local_lookup(z: jnp.ndarray, cb: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-shard cosine scores -> (best_score (N,), best_idx (N,))."""
    zn = z * jax.lax.rsqrt(jnp.sum(z * z, axis=-1, keepdims=True) + 1e-8)
    cn = cb * jax.lax.rsqrt(jnp.sum(cb * cb, axis=-1, keepdims=True) + 1e-8)
    scores = jnp.dot(zn, cn.T, preferred_element_type=jnp.float32)
    best = jnp.argmax(scores, axis=-1)
    return jnp.take_along_axis(scores, best[:, None], axis=-1)[:, 0], best.astype(jnp.int32)


def tp_nearest_codebook(z: jnp.ndarray, codebook: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """(N, D) queries x (K, D) codebook -> (N,) int32 codes, with the
    codebook sharded over mesh axis "model" and queries replicated on it
    (sharded over "data")."""
    k = codebook.shape[0]
    n_model = mesh.shape["model"]
    shard_k = k // n_model

    def kernel(z_l, cb_l):
        score_l, idx_l = _local_lookup(z_l, cb_l)
        # offset local indices into the global codebook
        my = jax.lax.axis_index("model")
        idx_g = idx_l + my * shard_k
        # gather candidates from every model shard: (n_model, N)
        scores = jax.lax.all_gather(score_l, "model")
        idxs = jax.lax.all_gather(idx_g, "model")
        win = jnp.argmax(scores, axis=0)  # (N,)
        return jnp.take_along_axis(idxs, win[None, :], axis=0)[0]

    fn = jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P("data", None), P("model", None)),
        out_specs=P("data"),
        check_vma=False,
    )
    return fn(z, codebook)
