"""HF-free projection sweep (proj_free_above_hz=8000)."""
import sys
sys.path.insert(0, "/root/repo")
import dataclasses, time
import numpy as np
axis_kind = sys.argv[1] if len(sys.argv) > 1 else "kmeans"
from nawc_tpu.cli.common import load_audio_batch, load_codec
from nawc_tpu.dsp.resample import resample
from nawc_tpu.eval.metrics import lsd, si_snr
from nawc_tpu.models.semantic import _DEFAULT_CFGS, SemanticWM
codec = load_codec("checkpoints/codec_24k.msgpack", "full")
base = _DEFAULT_CFGS[axis_kind]
wav = load_audio_batch("/root/reference/dataset/LibriSpeech/*.wav", 8, 24_000, 5.0)
def C(**kw):
    return dataclasses.replace(base, lsd_weight=1.0, proj_headroom_db=0.0,
                               proj_free_above_hz=8000.0, **kw)
configs = [
    ("p4_s300_sdr31_f8k", C(n_proj_phases=4, steps=300, target_sdr_db=31.0)),
    ("p4_s300_sdr29.5_f8k", C(n_proj_phases=4, steps=300, target_sdr_db=29.5)),
]
for name, cfg in configs:
    wm = SemanticWM(codec, axis_kind, cfg=cfg)
    t0 = time.perf_counter()
    marked = wm.embed(wav); np.asarray(marked)
    dt = time.perf_counter() - t0
    z = np.asarray(wm.score(marked)) / cfg.score_scale
    l24 = np.asarray(lsd(wav, marked)).mean()
    w16 = resample(wav, 24_000, 16_000); m16 = resample(marked, 24_000, 16_000)
    l16 = np.asarray(lsd(w16, m16)).mean()
    s16 = np.asarray(si_snr(w16, m16)).mean()
    passrate = float((0.28 * z >= 0.85).mean())
    print(f"[{name}] z={z.mean():5.2f}(min {z.min():5.2f}) pass={passrate:.2f} "
          f"LSD24={l24:5.2f} LSD16={l16:5.2f} SI-SNR16={s16:5.1f} t={dt:5.1f}s", flush=True)
