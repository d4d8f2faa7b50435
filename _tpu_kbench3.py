import time
import numpy as np
from mapper_tpu.align import pallas_dp
from mapper_tpu.align.params import AlignmentParameters

params = AlignmentParameters.defaults(max_error_rate=1.0)
rng = np.random.default_rng(3)
LQ, BAND, SHIFT = 160, 128, 32
B = 4096
bases = np.array([1,2,4,8], dtype=np.uint8)
qs, ws, ns, ms = [], [], [], []
for i in range(B):
    n = int(rng.integers(100, LQ))
    ref = bases[rng.integers(0,4,size=n+2*SHIFT)]
    q = np.array(ref[SHIFT:SHIFT+n]); q[int(rng.integers(0,n))] = bases[rng.integers(0,4)]
    qs.append(np.pad(q,(0,LQ-n))); ws.append(np.pad(ref,(0,LQ+BAND-len(ref))))
    ns.append(n); ms.append(len(ref))
qa, wa, na, ma = np.stack(qs), np.stack(ws), np.array(ns), np.array(ms)

for tile in (512, 1024):
    try:
        s = np.asarray(pallas_dp.banded_scores(qa, wa, na, ma, params, band=BAND, tile=tile, use_pallas=True, variant="roll"))
        t0=time.time()
        for _ in range(5):
            s = np.asarray(pallas_dp.banded_scores(qa, wa, na, ma, params, band=BAND, tile=tile, use_pallas=True, variant="roll"))
        dt=(time.time()-t0)/5
        print(f"roll tile={tile}: {dt*1000:.1f} ms for {B} -> {B/dt:.0f} pairs/s, {B*160*BAND/dt/1e9:.2f} GCUPS", flush=True)
    except Exception as e:
        print(f"roll tile={tile} FAILED: {str(e)[:160]}", flush=True)
