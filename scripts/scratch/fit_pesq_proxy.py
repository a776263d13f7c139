"""Fit a PESQ proxy: regression from (si_snr, snr, lsd, stoi) -> PESQ-wb,
calibrated on the reference's 720 checked-in quality rows (real ITU PESQ
values computed by the reference pipeline, audio_quality_check/*.csv).
Prints ridge coefficients + cross-validated accuracy."""
import sys, pathlib, glob
import numpy as np
import pandas as pd

ROOT = "/root/reference/audio_quality_check"
frames = []
for f in sorted(glob.glob(f"{ROOT}/*_quality_results.csv")):
    df = pd.read_csv(f)
    df["method"] = pathlib.Path(f).name.split("_")[0]
    frames.append(df)
df = pd.concat(frames, ignore_index=True)
df = df.dropna(subset=["pesq"])
print("rows:", len(df), "pesq range:", df.pesq.min(), df.pesq.max())

def features(sisnr, snr, lsd, stoi):
    sisnr = np.clip(sisnr, 0, 60); snr = np.clip(snr, 0, 60)
    lsd = np.clip(lsd, 0, 30); stoi = np.clip(stoi, 0.5, 1.0)
    cols = [sisnr, snr, lsd, stoi,
            sisnr**2, lsd**2, stoi**2, sisnr*lsd, sisnr*stoi, lsd*stoi,
            np.log1p(lsd), np.sqrt(np.maximum(sisnr,0))]
    return np.stack(cols, axis=-1)

X = features(df.si_snr_watermarked.values, df.snr.values, df.lsd.values, df.stoi.values)
y = df.pesq.values
mu, sd = X.mean(0), X.std(0) + 1e-9

def fit(Xtr, ytr, lam=1.0):
    Z = (Xtr - mu) / sd
    Z = np.concatenate([Z, np.ones((len(Z),1))], 1)
    A = Z.T @ Z + lam * np.eye(Z.shape[1]); A[-1,-1] -= lam
    return np.linalg.solve(A, Z.T @ ytr)

def predict(w, Xte):
    Z = (Xte - mu) / sd
    Z = np.concatenate([Z, np.ones((len(Z),1))], 1)
    return np.clip(Z @ w, 1.02, 4.64)

# 5-fold CV
rng = np.random.default_rng(0); idx = rng.permutation(len(y))
maes = []
for k in range(5):
    te = idx[k::5]; tr = np.setdiff1d(idx, te)
    w = fit(X[tr], y[tr]); pred = predict(w, X[te])
    maes.append(np.abs(pred - y[te]).mean())
print(f"5-fold CV MAE: {np.mean(maes):.3f}")
# leave-one-method-out
for m in df.method.unique():
    te = (df.method == m).values; tr = ~te
    w = fit(X[tr], y[tr]); pred = predict(w, X[te])
    print(f"LOMO {m}: MAE={np.abs(pred-y[te]).mean():.3f} mean_true={y[te].mean():.2f} mean_pred={pred.mean():.2f}")
# final fit on all data
w = fit(X, y)
pred = predict(w, X)
print(f"in-sample MAE: {np.abs(pred-y).mean():.3f} R2: {1 - np.var(pred-y)/np.var(y):.3f}")
np.set_printoptions(precision=8, suppress=False)
print("MU =", repr(mu)); print("SD =", repr(sd)); print("W =", repr(w))
