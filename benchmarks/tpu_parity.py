"""On-device kernel parity check (VERDICT r2 item 10): asserts the Pallas
pen kernel (f32, and int16 when the toolchain can build it) and the fused
gathered program agree with the pure-jnp oracle ON THE REAL TPU — not just
in interpret mode — and records the result in TPU_PARITY.json.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mapper_tpu import basepairs
from mapper_tpu.align import pallas_dp
from mapper_tpu.align.params import AlignmentParameters


def make_batch(rng, b, lq, band, shift):
    bases = np.array([1, 2, 4, 8], dtype=np.uint8)
    qs, ws, ns, ms = [], [], [], []
    for _ in range(b):
        n = int(rng.integers(lq - 40, lq))
        ref = bases[rng.integers(0, 4, size=n + 2 * shift)]
        q = list(ref[shift : shift + n])
        k = rng.random()
        if k < 0.5:
            for _ in range(int(rng.integers(0, 5))):
                q[int(rng.integers(0, len(q)))] = int(bases[rng.integers(0, 4)])
        elif k < 0.8:
            j = int(rng.integers(5, len(q) - 5))
            if rng.random() < 0.5:
                del q[j : j + int(rng.integers(1, 3))]
            else:
                q.insert(j, int(bases[rng.integers(0, 4)]))
        q = np.array(q[:n], dtype=np.uint8)
        n = q.shape[0]
        qs.append(np.pad(q, (0, lq - n)))
        ws.append(np.pad(ref, (0, lq + band - len(ref))))
        ns.append(n)
        ms.append(len(ref))
    return np.stack(qs), np.stack(ws), np.array(ns), np.array(ms)


def main():
    assert jax.default_backend() == "tpu", "run on the real TPU"
    rng = np.random.default_rng(123)
    params = AlignmentParameters.defaults(max_error_rate=1.0)
    report = {"backend": "tpu", "checks": {}}

    for band, tile in ((64, 1024), (128, 1024)):
        lq = 192
        q, w, n, m = make_batch(rng, 2048, lq, band, band // 2)
        oracle = np.asarray(
            pallas_dp.banded_scores_reference(q, w, n, m, params, band)
        )
        t0 = time.time()
        got = np.asarray(
            pallas_dp.banded_scores(
                q, w, n, m, params, band=band, tile=tile, use_pallas=True
            )
        )
        mask = oracle < 1e8
        err = float(np.abs(got[mask] - oracle[mask]).max()) if mask.any() else 0.0
        sat_ok = bool(np.all(got[~mask] >= 1e8) if (~mask).any() else True)
        used_int16 = not pallas_dp._int16_disabled() and (
            pallas_dp._quantize_params(params, ((lq + 127) // 128) * 128, band)
            is not None
        )
        ok = err < 1e-4 and sat_ok
        report["checks"][f"pen_band{band}"] = {
            "ok": ok,
            "max_abs_err": err,
            "finite_rows": int(mask.sum()),
            "int16_attempted": used_int16,
            "int16_active": not pallas_dp._int16_disabled(),
            "seconds": round(time.time() - t0, 1),
        }
        print(f"pen band={band}: ok={ok} err={err:.2e} "
              f"int16_active={not pallas_dp._int16_disabled()}", flush=True)
        assert ok, f"band {band} parity failed: {err}"

    # fused gathered program vs host-window oracle
    concat = np.array([1, 2, 4, 8], dtype=np.uint8)[
        np.random.default_rng(5).integers(0, 4, size=100_000)
    ]
    band, lq = 64, 192
    reads = np.zeros((256, lq), dtype=np.uint8)
    n_read = rng.integers(120, lq + 1, size=256)
    for r in range(256):
        s = int(rng.integers(0, concat.shape[0] - lq))
        reads[r, : n_read[r]] = concat[s : s + int(n_read[r])]
    B = 2048
    read_id = rng.integers(0, 256, size=B).astype(np.int32)
    reversed_ = rng.random(B) < 0.5
    nn = n_read[read_id].astype(np.int64)
    win_start = rng.integers(0, concat.shape[0] - lq - band, size=B).astype(np.int64)
    w_len = np.minimum(nn + band, concat.shape[0] - win_start).astype(np.int64)
    lane = rng.integers(0, band, size=B).astype(np.int64)

    q_codes = np.zeros((B, lq), dtype=np.uint8)
    for c in range(B):
        codes = reads[read_id[c], : nn[c]]
        if reversed_[c]:
            codes = basepairs.reverse_complement(codes)
        q_codes[c, : nn[c]] = codes
    w_idx = win_start[:, None] + np.arange(lq + band, dtype=np.int64)[None, :]
    w_idx = np.minimum(w_idx, concat.shape[0] - 1)
    w_codes = concat[w_idx]
    oracle = np.asarray(
        pallas_dp.banded_scores_reference(q_codes, w_codes, nn, w_len, params, band)
    )
    t0 = time.time()
    concat_dev = jax.device_put(concat)
    banded_got, ung_got = pallas_dp.banded_scores_gathered(
        reads, concat_dev, read_id, reversed_, win_start, lane, nn, w_len,
        params, band=band, tile=1024, use_pallas=True,
    )
    banded_got = np.asarray(banded_got)
    mask = oracle < 1e8
    err = float(np.abs(banded_got[mask] - oracle[mask]).max())
    ok = err < 1e-4 and bool(np.all(banded_got[~mask] >= 1e8) if (~mask).any() else True)
    report["checks"]["gathered_band64"] = {
        "ok": ok,
        "max_abs_err": err,
        "rows": B,
        "seconds": round(time.time() - t0, 1),
    }
    print(f"gathered band=64: ok={ok} err={err:.2e}", flush=True)
    assert ok, f"gathered parity failed: {err}"

    with open("/root/repo/TPU_PARITY.json", "w") as f:
        json.dump(report, f, indent=1)
    print("wrote TPU_PARITY.json", flush=True)


if __name__ == "__main__":
    main()
