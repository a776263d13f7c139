import pickle, numpy as np, itertools
with open("/tmp/pesq_cache.pkl", "rb") as fh: data = pickle.load(fh)
y = np.asarray([e["pesq"] for e in data]); M = np.asarray([e["method"] for e in data])

def feats_all(LEVEL=1000.0, POW=0.15, MASK=0.5, ASYM_LO=1.5, ASYM_HI=12.0,
              GAIN_CLIP=10.0, P=2.0, CHUNK=20, ADD=50.0, SPLIT=21):
    out = np.empty((len(data), 3))
    for i, e in enumerate(data):
        pr = e["pr"].astype(np.float64) * (LEVEL / (e["rms_r"] + 1e-12))**2
        pd = e["pd"].astype(np.float64) * (LEVEL / (e["rms_d"] + 1e-12))**2
        energy = pr.sum(axis=1); active = energy > 1e-2 * energy.mean()
        if active.sum() < 4: active = np.ones_like(active, bool)
        g = (pr[active].mean(0) + 1e-6) / (pd[active].mean(0) + 1e-6)
        pd = pd * np.clip(g, 1/GAIN_CLIP, GAIN_CLIP)[None]
        lr = np.power(pr + 1e-12, POW); ld = np.power(pd + 1e-12, POW)
        dsym = np.maximum(np.abs(ld - lr) - MASK*np.minimum(lr, ld), 0.0)
        ratio = np.power((pd + ADD)/(pr + ADD), 1.2)
        asym = np.where(ratio < ASYM_LO, 0.0, np.minimum(ratio, ASYM_HI))
        dasym = dsym * asym
        def two(v):
            pad = (-len(v)) % CHUNK; v = np.pad(v, (0, pad))
            c = np.power(np.mean(np.power(v.reshape(-1, CHUNK), P), 1), 1/P)
            return float(np.sqrt(np.mean(c**2)))
        fs_lo = np.sqrt(np.mean(dsym[active][:, :SPLIT]**2, axis=1))
        fs_hi = np.sqrt(np.mean(dsym[active][:, SPLIT:]**2, axis=1))
        fa = np.mean(dasym[active], axis=1)
        out[i] = (two(fs_lo), two(fs_hi), two(fa))
    return out

def design(F): return np.concatenate([np.ones((len(F),1)), np.log1p(F*100)], 1)
def score(F):
    def fit(F_, y_): return np.linalg.lstsq(design(F_), y_, rcond=None)[0]
    def pred(w, F_): return np.clip(design(F_) @ w, 1.02, 4.64)
    lomo = {}
    for m in np.unique(M):
        te = M == m; w = fit(F[~te], y[~te]); lomo[m] = float(np.abs(pred(w, F[te]) - y[te]).mean())
    w = fit(F, y); allmae = float(np.abs(pred(w, F) - y).mean())
    return max(lomo.values()), float(np.mean(list(lomo.values()))), allmae, lomo, w

best = None
for POW, MASK, ADD, SPLIT in itertools.product([0.1, 0.15, 0.2], [0.5, 0.75, 1.0], [10.0, 50.0, 200.0], [14, 21, 28]):
    F = feats_all(POW=POW, MASK=MASK, ADD=ADD, SPLIT=SPLIT)
    mx, mn, am, lomo, w = score(F)
    if best is None or mx < best[0]:
        best = (mx, mn, am, lomo, w, (POW, MASK, ADD, SPLIT))
        print(f"best lomo_max={mx:.3f} mean={mn:.3f} all={am:.3f} cfg POW={POW} MASK={MASK} ADD={ADD} SPLIT={SPLIT}")
        print("  ", {k: round(v,2) for k,v in lomo.items()})
print("BEST:", best[5], "w=", np.array2string(best[4], precision=8))
