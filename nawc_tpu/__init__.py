"""nawc_tpu — TPU-native neural-audio-watermarking / codec / interpretability framework.

A brand-new JAX/XLA/Pallas/pjit re-design of the capabilities of the reference
research codebase ``Akinesia112/Neural-Audio-Watermarking-Codec-Interpretability-
Explainability`` (see SURVEY.md): watermark embed/detect for six method families,
LALM codec-roundtrip attack simulation, a 20-attack robustness suite,
interpretability (latent-manifold analysis, codebook-layer ablation, MC
uncertainty, saliency), and audio-quality evaluation — all batched, jitted and
shardable over a TPU mesh instead of the reference's per-file Python loops.

Subpackages
-----------
dsp       STFT/iSTFT, mel filterbank, polyphase resampler, framing, filters.
ops       Pallas TPU kernels (RVQ codebook lookup, ...) with jnp fallbacks.
codec     SNAC-style convolutional codec with multi-scale residual VQ.
models    Watermark embedder/detector families (spread-spectrum, neural
          additive, semantic manifold, chunked multibit, psychoacoustic).
attacks   Batched DSP attack suite + codec-roundtrip + layer ablation + PGD.
interp    Manifold analysis, ablation sweeps, MC uncertainty, saliency.
eval      Quality metrics, benchmark drivers, CSV/plot reporting.
parallel  Mesh construction, shardings, collective helpers.
train     Optax training steps for codec and neural watermarker.
utils     Config dataclasses, PRNG plumbing, padding, WAV I/O.
"""

__version__ = "0.1.0"


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache for every CLI / library entry point.

    TPU compiles here go through a remote tunnel and are serial across
    processes (CLAUDE.md), so re-jitting the same codec/watermark graphs in
    each CLI invocation costs minutes.  The on-disk cache makes the second
    process pay ~0.  Safe on CPU too; never raises (older jax versions).
    """
    import os

    try:
        import jax

        # /root persists across driver VM restarts; /tmp does not (a fresh
        # VM wiped the round-3 cache and made every compile cold again)
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get(
                "NAWC_JAX_CACHE",
                os.path.expanduser("~/.cache/nawc_jax_cache"),
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()
