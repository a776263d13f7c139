"""Iterate disturbance-model + mapping variants on cached band powers."""
import pickle, numpy as np
import itertools

with open("/tmp/pesq_cache.pkl", "rb") as fh:
    data = pickle.load(fh)

def disturbance(e, LEVEL=1000.0, POW=0.23, MASK=0.25, ASYM_LO=3.0, ASYM_HI=12.0,
                GAIN_CLIP=10.0, P=6.0, CHUNK=20, ADD=50.0):
    pr = e["pr"].astype(np.float64) * (LEVEL / (e["rms_r"] + 1e-12))**2
    pd = e["pd"].astype(np.float64) * (LEVEL / (e["rms_d"] + 1e-12))**2
    energy = pr.sum(axis=1)
    active = energy > 1e-2 * energy.mean()
    if active.sum() < 4: active = np.ones_like(active, bool)
    g = (pr[active].mean(0) + 1e-6) / (pd[active].mean(0) + 1e-6)
    pd = pd * np.clip(g, 1/GAIN_CLIP, GAIN_CLIP)[None]
    lr = np.power(pr + 1e-12, POW); ld = np.power(pd + 1e-12, POW)
    diff = ld - lr
    dsym = np.maximum(np.abs(diff) - MASK*np.minimum(lr, ld), 0.0)
    ratio = np.power((pd + ADD)/(pr + ADD), 1.2)
    asym = np.where(ratio < ASYM_LO, 0.0, np.minimum(ratio, ASYM_HI))
    dasym = dsym * asym
    fs = np.sqrt(np.mean(dsym[active]**2, axis=1))
    fa = np.mean(dasym[active], axis=1)
    def two(v):
        pad = (-len(v)) % CHUNK
        v = np.pad(v, (0, pad))
        c = np.power(np.mean(np.power(v.reshape(-1, CHUNK), P), 1), 1/P)
        return float(np.sqrt(np.mean(c**2)))
    return two(fs), two(fa)

def evaluate(feat_fn, design_fn, tag):
    F = np.asarray([feat_fn(e) for e in data])
    y = np.asarray([e["pesq"] for e in data])
    M = np.asarray([e["method"] for e in data])
    def fit(F, y):
        X = design_fn(F); return np.linalg.lstsq(X, y, rcond=None)[0]
    def pred(w, F): return np.clip(design_fn(F) @ w, 1.02, 4.64)
    rng = np.random.default_rng(0); idx = rng.permutation(len(y))
    cv = np.mean([np.abs(pred(fit(F[np.setdiff1d(idx, idx[k::5])], y[np.setdiff1d(idx, idx[k::5])]), F[idx[k::5]]) - y[idx[k::5]]).mean() for k in range(5)])
    lomo = {}
    for m in np.unique(M):
        te = M == m; w = fit(F[~te], y[~te]); lomo[m] = float(np.abs(pred(w, F[te]) - y[te]).mean())
    w = fit(F, y)
    print(f"{tag}: cv={cv:.3f} lomo_max={max(lomo.values()):.3f} lomo={ {k: round(v,2) for k,v in lomo.items()} }")
    return w, F, y

# variant 1: current defaults, log features
d1 = {e_id: disturbance(e) for e_id, e in enumerate(data)}
def f1(e): return d1[data.index(e)]
# avoid repeated index: precompute
D = np.asarray([disturbance(e) for e in data])
ylist = np.asarray([e["pesq"] for e in data])
def mk(feats): 
    i = [0]
    def f(e):
        v = feats[i[0]]; i[0] += 1; return v
    return f

def design_lin(F): return np.concatenate([np.ones((len(F),1)), F], 1)
def design_log(F): return np.concatenate([np.ones((len(F),1)), np.log1p(F*100)], 1)
def design_sqrt(F): return np.concatenate([np.ones((len(F),1)), np.sqrt(F)], 1)

class Arr:  # wrap: feat_fn receives entry; use precomputed row by identity
    def __init__(self, D): self.D = D; self.i = 0
    def __call__(self, e):
        v = self.D[self.i]; self.i += 1; return v

for name, dfn in [("lin", design_lin), ("log", design_log), ("sqrt", design_sqrt)]:
    evaluate(Arr(D), dfn, f"base-{name}")
