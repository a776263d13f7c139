"""Sharded evaluation pipeline: embed -> codec-roundtrip attack -> detect
as ONE pjit-partitioned program with the clip batch sharded over "data".

This is the multi-device form of the reference's per-file survivability
loop (``watermark_testing.py:798-838``): where the reference iterates files
on one device, here a whole shard of clips rides each chip and XLA inserts
the (nil, for this pipeline) collectives — params are replicated, every op
is batch-parallel, so the partitioned program is communication-free and
scales linearly over ICI.
"""

from __future__ import annotations

import functools

import jax

from .mesh import data_sharding


def make_sharded_eval(codec, wm, mesh):
    """-> run(wav (B,T), msg (B,n_bits)) = (marked, attacked, presence, bits)

    with all batch outputs sharded over the mesh's "data" axis. B must be a
    multiple of mesh.shape["data"].
    """
    from ..attacks.codec import codec_roundtrip

    ds2 = data_sharding(mesh, 2)
    ds1 = data_sharding(mesh, 1)

    @functools.partial(
        jax.jit,
        in_shardings=(ds2, ds2),
        out_shardings=(ds2, ds2, ds1, ds2),
    )
    def run(wav, msg):
        marked = wm.embed(wav, msg)
        attacked = codec_roundtrip(codec, marked, in_sr=wm.sample_rate)
        presence, bits = wm.detect(attacked)
        return marked, attacked, presence, bits

    return run
