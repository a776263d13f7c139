import sys, pathlib, glob, pickle
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent.parent))
import numpy as np, pandas as pd
from nawc_tpu.utils.audio_io import read_wav
from nawc_tpu.eval.pesq_proxy import _to_16k, _bark_matrix, _frames_power

REF = pathlib.Path("/root/reference/audio_quality_check")
W = _bark_matrix()
out = []
n = 0
for f in sorted(REF.glob("*_quality_results.csv")):
    method = f.name.split("_")[0]
    df = pd.read_csv(f).dropna(subset=["pesq"])
    for _, r in df.iterrows():
        c, sr1 = read_wav(str((REF / r["clean"]).resolve()))
        w_, sr2 = read_wav(str((REF / r["watermarked"]).resolve()))
        c = _to_16k(c, sr1); w_ = _to_16k(w_, sr2)
        m = min(len(c), len(w_)); c, w_ = c[:m], w_[:m]
        pr = (_frames_power(c) @ W.T).astype(np.float32)
        pd_ = (_frames_power(w_) @ W.T).astype(np.float32)
        out.append(dict(method=method, pesq=float(r["pesq"]),
                        rms_r=float(np.sqrt(np.mean(c**2))), rms_d=float(np.sqrt(np.mean(w_**2))),
                        pr=pr, pd=pd_))
        n += 1
        if n % 120 == 0: print(n, flush=True)
with open("/tmp/pesq_cache.pkl", "wb") as fh:
    pickle.dump(out, fh)
print("cached", n)
