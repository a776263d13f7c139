import pickle, numpy as np, itertools
with open("/tmp/pesq_cache.pkl", "rb") as fh: data = pickle.load(fh)
y = np.asarray([e["pesq"] for e in data]); M = np.asarray([e["method"] for e in data])
exec(open("/tmp/feats_fn.py").read())
def design(F): return np.concatenate([np.ones((len(F),1)), np.log1p(F*100)], 1)
def score(F):
    def fit(F_, y_): return np.linalg.lstsq(design(F_), y_, rcond=None)[0]
    def pred(w, F_): return np.clip(design(F_) @ w, 1.02, 4.64)
    lomo = {}
    for m in np.unique(M):
        te = M == m; w = fit(F[~te], y[~te]); lomo[m] = float(np.abs(pred(w, F[te]) - y[te]).mean())
    w = fit(F, y); am = float(np.abs(pred(w, F) - y).mean())
    return max(lomo.values()), float(np.mean(list(lomo.values()))), am, lomo, w
best = None
for MASK, SPLIT, P, GC, AHI in itertools.product([0.4,0.5,0.6],[26,28,30,32],[2.0,6.0],[10.0,100.0],[12.0,50.0]):
    F = feats_all(POW=0.15, MASK=MASK, ADD=50.0, SPLIT=SPLIT, P=P, GAIN_CLIP=GC, ASYM_HI=AHI)
    mx, mn, am, lomo, w = score(F)
    if best is None or mx < best[0]:
        best = (mx, mn, am, lomo, w, dict(MASK=MASK,SPLIT=SPLIT,P=P,GC=GC,AHI=AHI))
        print(f"best lomo_max={mx:.3f} mean={mn:.3f} all={am:.3f} {best[5]}")
        print("  ", {k: round(v,2) for k,v in lomo.items()})
print("BEST:", best[5]); print("w =", np.array2string(best[4], precision=8))
