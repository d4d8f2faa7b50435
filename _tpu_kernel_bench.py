import time, sys
import numpy as np
import jax
from mapper_tpu.align import pallas_dp
from mapper_tpu.align.params import AlignmentParameters
print("backend:", jax.default_backend(), flush=True)

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

for tile, chunk in ((128, 128), (128, 64)):
    try:
        t0=time.time()
        s = np.asarray(pallas_dp.banded_scores(qa, wa, na, ma, params, band=BAND, tile=tile, chunk=chunk, use_pallas=True))
        print(f"tile={tile} chunk={chunk} compile+run: {time.time()-t0:.1f}s", flush=True)
        t0=time.time()
        for _ in range(5):
            s = np.asarray(pallas_dp.banded_scores(qa, wa, na, ma, params, band=BAND, tile=tile, chunk=chunk, use_pallas=True))
        dt=(time.time()-t0)/5
        print(f"tile={tile} chunk={chunk}: {dt*1000:.1f} ms for {B} pairs -> {B/dt:.0f} pairs/s, {B*160*BAND/dt/1e9:.2f} GCUPS", flush=True)
    except Exception as e:
        print(f"tile={tile} chunk={chunk} FAILED: {str(e)[:200]}", flush=True)
sj = np.asarray(pallas_dp.banded_scores(qa[:256], wa[:256], na[:256], ma[:256], params, band=BAND, use_pallas=False))
sp = np.asarray(pallas_dp.banded_scores(qa[:256], wa[:256], na[:256], ma[:256], params, band=BAND, tile=128, use_pallas=True))
print("maxdiff vs jnp:", float(np.abs(sj-sp).max()), flush=True)
