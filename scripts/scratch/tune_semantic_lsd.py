"""Sweep SemanticWMConfig.lsd_weight: LSD/SI-SNR vs detection operating point
(clean score, codec-roundtrip survival) on real speech with the trained codec."""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent.parent))
import dataclasses, glob
import numpy as np, jax, jax.numpy as jnp
print("backend:", jax.default_backend(), flush=True)
from nawc_tpu.cli.common import load_codec, load_audio_batch
from nawc_tpu.models.semantic import SemanticWM, _DEFAULT_CFGS
from nawc_tpu.attacks.codec import codec_roundtrip
from nawc_tpu.eval.metrics import lsd, si_snr

codec = load_codec("checkpoints/codec_24k.msgpack", "full")
wav = load_audio_batch("/root/reference/dataset/LibriSpeech/*.wav", 8, 24_000, 2.0)
print("wav", wav.shape, flush=True)

for kind in ["pca", "kmeans"]:
    base = _DEFAULT_CFGS[kind]
    for lw in [0.0, 0.05, 0.15, 0.4]:
        cfg = dataclasses.replace(base, lsd_weight=lw)
        wm = SemanticWM(codec, kind, cfg=cfg)
        marked = jax.block_until_ready(wm.embed(wav))
        s_clean = wm.score(wav); s_marked = wm.score(marked)
        att = codec_roundtrip(codec, marked)
        s_att = wm.score(att)
        q_lsd = float(jnp.mean(lsd(wav, marked)))
        q_sisnr = float(jnp.mean(si_snr(wav, marked)))
        pass_clean = float(jnp.mean((s_marked > 0.85)))
        pass_att = float(jnp.mean((s_att > 0.85)))
        print(f"{kind} lw={lw:<5} LSD={q_lsd:6.2f} SI-SNR={q_sisnr:6.2f} "
              f"score(unmk)={float(jnp.mean(s_clean)):5.2f} score(mk)={float(jnp.mean(s_marked)):5.2f} "
              f"score(att)={float(jnp.mean(s_att)):5.2f} pass_mk={pass_clean:.2f} pass_att={pass_att:.2f}", flush=True)
print("DONE", flush=True)
