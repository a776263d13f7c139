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
