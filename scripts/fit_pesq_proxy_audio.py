"""Calibrate nawc_tpu.eval.pesq_proxy against the reference's 720 true
PESQ-wb values, computing Bark disturbances on the actual checked-in wav
pairs (audio_quality_check/*_quality_results.csv + results/LibriSpeech-init).

Prints fitted coefficients (to paste into pesq_proxy._COEF) plus 5-fold and
leave-one-method-out MAE (the accuracy note recorded in docs/metrics.md)."""
import sys, pathlib, glob
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
import pandas as pd
from nawc_tpu.utils.audio_io import read_wav
from nawc_tpu.eval.pesq_proxy import bark_disturbance, _CLIP

REF = pathlib.Path("/root/reference/audio_quality_check")
rows = []
for f in sorted(REF.glob("*_quality_results.csv")):
    method = f.name.split("_")[0]
    df = pd.read_csv(f).dropna(subset=["pesq"])
    for _, r in df.iterrows():
        clean = (REF / r["clean"]).resolve()
        wm = (REF / r["watermarked"]).resolve()
        rows.append((method, str(clean), str(wm), float(r["pesq"])))
print("pairs:", len(rows))

feats, ys, methods = [], [], []
for i, (m, cp, wp, y) in enumerate(rows):
    c, sr1 = read_wav(cp); w, sr2 = read_wav(wp)
    # pairs may be stored at different rates (original 24k, wm at wm_sr);
    # bark_disturbance resamples both to 16 kHz, matching the reference's
    # load_audio(sr=16000) (evaluate_quality.py:20-27)
    from nawc_tpu.eval.pesq_proxy import _to_16k
    c = _to_16k(c, sr1); w = _to_16k(w, sr2)
    ds, da = bark_disturbance(c, w, 16000)
    feats.append((ds, da)); ys.append(y); methods.append(m)
    if i % 120 == 0: print(i, m, f"ds={ds:.4f} da={da:.4f} pesq={y:.2f}", flush=True)
F = np.asarray(feats); y = np.asarray(ys); M = np.asarray(methods)

def design(F):
    ds, da = F[:, 0], F[:, 1]
    return np.stack([np.ones_like(ds), ds, da, ds * ds], axis=1)

def fit(F, y):
    X = design(F)
    return np.linalg.lstsq(X, y, rcond=None)[0]

def pred(w, F):
    return np.clip(design(F) @ w, *_CLIP)

rng = np.random.default_rng(0); idx = rng.permutation(len(y))
maes = []
for k in range(5):
    te = idx[k::5]; tr = np.setdiff1d(idx, te)
    w = fit(F[tr], y[tr]); maes.append(np.abs(pred(w, F[te]) - y[te]).mean())
print(f"5-fold CV MAE: {np.mean(maes):.3f}")
for m in np.unique(M):
    te = M == m; w = fit(F[~te], y[~te]); p = pred(w, F[te])
    print(f"LOMO {m}: MAE={np.abs(p - y[te]).mean():.3f} true_mean={y[te].mean():.2f} pred_mean={p.mean():.2f}")
w = fit(F, y); p = pred(w, F)
print(f"all-data MAE={np.abs(p-y).mean():.3f} R2={1 - np.var(p-y)/np.var(y):.3f}")
print("COEF: a=%.8f b_sym=%.8f c_asym=%.8f d_symsq=%.8f" % tuple(w))
np.save("/tmp/pesq_fit.npy", np.concatenate([F, y[:, None]], axis=1))
