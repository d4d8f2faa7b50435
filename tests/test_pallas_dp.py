"""Device banded-DP scoring tests: the jnp path must agree with the exact host
DP on in-band alignments, and the Pallas kernel (interpret mode on CPU) must
agree with the jnp path."""

import numpy as np
import pytest

from mapper_tpu import basepairs
from mapper_tpu.align import pallas_dp
from mapper_tpu.align.dp import _forward_dp
from mapper_tpu.align.params import AlignmentParameters


def make_params():
    return AlignmentParameters.defaults(max_error_rate=1.0)


def random_pair(rng, n, shift, num_snps=0, indel=0):
    ref = rng.integers(0, 4, size=n + 2 * shift)
    ref_codes = np.array([1, 2, 4, 8], dtype=np.uint8)[ref]
    q = list(ref_codes[shift : shift + n])
    for _ in range(num_snps):
        pos = int(rng.integers(0, len(q)))
        q[pos] = int(np.array([1, 2, 4, 8])[rng.integers(0, 4)])
    if indel > 0:
        pos = int(rng.integers(5, len(q) - 5))
        if rng.random() < 0.5:
            for _ in range(indel):
                q.insert(pos, int(np.array([1, 2, 4, 8])[rng.integers(0, 4)]))
            q = q[:n]
        else:
            del q[pos : pos + indel]
    return np.array(q, dtype=np.uint8), ref_codes


def host_exact_score(q, w, params):
    best, _, _ = _forward_dp(q, w, params, may_extend=False, max_ins_ext=0.0)
    return float(best[q.shape[0]].min())


@pytest.mark.parametrize("seed", range(6))
def test_jnp_scores_match_host_dp(seed):
    rng = np.random.default_rng(seed)
    params = make_params()
    batch_q, batch_w, ns, ms, expected = [], [], [], [], []
    lq, shift = 48, 8
    band = 32
    for case in range(8):
        n = int(rng.integers(20, lq))
        q, w = random_pair(rng, n, shift, num_snps=int(rng.integers(0, 3)), indel=int(rng.integers(0, 2)))
        n = q.shape[0]
        m = w.shape[0]
        expected.append(host_exact_score(q, w, params))
        batch_q.append(np.pad(q, (0, lq - n)))
        batch_w.append(np.pad(w, (0, lq + band - m)))
        ns.append(n)
        ms.append(m)
    scores = np.asarray(
        pallas_dp.banded_scores_reference(
            np.stack(batch_q), np.stack(batch_w), np.array(ns), np.array(ms), params, band
        )
    )
    for i in range(8):
        assert scores[i] == pytest.approx(expected[i], abs=1e-4), f"case {i}"


def test_pallas_interpret_matches_jnp():
    rng = np.random.default_rng(42)
    params = make_params()
    lq, shift, band, tile = 32, 4, 16, 4
    batch_q, batch_w, ns, ms = [], [], [], []
    for _ in range(8):
        n = int(rng.integers(16, lq))
        q, w = random_pair(rng, n, shift, num_snps=1, indel=1)
        batch_q.append(np.pad(q, (0, lq - q.shape[0])))
        batch_w.append(np.pad(w, (0, lq + band - w.shape[0])))
        ns.append(q.shape[0])
        ms.append(w.shape[0])
    q_arr, w_arr = np.stack(batch_q), np.stack(batch_w)
    n_arr, m_arr = np.array(ns), np.array(ms)
    jnp_scores = np.asarray(
        pallas_dp.banded_scores_reference(q_arr, w_arr, n_arr, m_arr, params, band)
    )
    pallas_scores = np.asarray(
        pallas_dp.banded_scores(
            q_arr, w_arr, n_arr, m_arr, params, band=band, tile=tile,
            use_pallas=True, interpret=True, chunk=16,
        )
    )
    np.testing.assert_allclose(pallas_scores, jnp_scores, atol=1e-5)


def test_perfect_match_scores_zero():
    params = make_params()
    rng = np.random.default_rng(7)
    q, w = random_pair(rng, 40, 8)
    scores = np.asarray(
        pallas_dp.banded_scores_reference(
            q[None, :], w[None, :], np.array([40]), np.array([w.shape[0]]), params, 32
        )
    )
    assert scores[0] == pytest.approx(0.0, abs=1e-6)


def test_snp_scores_mutation_penalty():
    params = make_params()
    rng = np.random.default_rng(8)
    q, w = random_pair(rng, 40, 8, num_snps=1)
    scores = np.asarray(
        pallas_dp.banded_scores_reference(
            q[None, :], w[None, :], np.array([40]), np.array([w.shape[0]]), params, 32
        )
    )
    # one SNP -> penalty 1.0 (unless the random SNP hit the same base)
    assert scores[0] in (pytest.approx(0.0), pytest.approx(1.0))
