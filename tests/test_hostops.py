"""Tests for the native host library (csrc/hostops.cpp) vs numpy oracles."""
import numpy as np
import pytest

from tgb_tgn_dgl_tpu.data import hostops
from tgb_tgn_dgl_tpu.data.build_hostops import build_if_needed
from tgb_tgn_dgl_tpu.data.dependency import get_block

pytestmark = pytest.mark.skipif(not build_if_needed(),
                                reason="C++ toolchain unavailable")


def _stream(n_edges=5000, n_nodes=300, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_nodes, n_edges).astype(np.int32)
    dst = rng.integers(0, n_nodes, n_edges).astype(np.int32)
    t = np.cumsum(rng.exponential(1.0, n_edges)).astype(np.float32)
    return src, dst, t


def test_dependency_blocks_matches_numpy():
    src, dst, _ = _stream()
    for bs in (128, 1000, 5000):
        cc = hostops.dependency_blocks(src, dst, bs, num_threads=4)
        ref = np.empty(len(src), np.int32)
        for lo in range(0, len(src), bs):
            hi = min(lo + bs, len(src))
            ref[lo:hi] = get_block(src[lo:hi], dst[lo:hi])
        np.testing.assert_array_equal(cc, ref)


def test_build_tcsr_oracle():
    src, dst, t = _stream(n_edges=2000, n_nodes=100)
    N = 100
    indptr, indices, eid, ts = hostops.build_tcsr(src, dst, t, N)
    assert indptr[-1] == 2 * len(src)
    for v in (0, 1, 17, 99):
        lo, hi = indptr[v], indptr[v + 1]
        # adjacency = all events touching v, in chronological order
        mask = (src == v) | (dst == v)
        want_eid = np.nonzero(mask)[0]
        # self-loops appear twice
        reps = ((src == v) & (dst == v))
        want = np.sort(np.concatenate([want_eid, np.nonzero(reps)[0]]))
        got = np.sort(eid[lo:hi])
        np.testing.assert_array_equal(got, want)
        assert (np.diff(ts[lo:hi]) >= 0).all()
        partners = np.where(src[eid[lo:hi]] == v, dst[eid[lo:hi]],
                            src[eid[lo:hi]])
        # partner correct except for self loops where both equal v
        ok = (indices[lo:hi] == partners) | (src[eid[lo:hi]] == dst[eid[lo:hi]])
        assert ok.all()


def test_sample_recent_oracle():
    src, dst, t = _stream(n_edges=3000, n_nodes=80, seed=1)
    N, K = 80, 7
    indptr, indices, eid, ts = hostops.build_tcsr(src, dst, t, N)
    rng = np.random.default_rng(2)
    nodes = rng.integers(0, N, 50).astype(np.int32)
    times = rng.choice(t, 50).astype(np.float32)
    nbr, out_eid, out_ts = hostops.sample_recent(
        indptr, indices, eid, ts, nodes, times, K)
    for q in range(50):
        v, tq = nodes[q], times[q]
        lo, hi = indptr[v], indptr[v + 1]
        hist = [(ts[i], eid[i], indices[i]) for i in range(lo, hi)
                if ts[i] < tq]
        want = hist[-K:]
        got_valid = [(out_ts[q, j], out_eid[q, j], nbr[q, j])
                     for j in range(K) if out_eid[q, j] >= 0]
        assert len(got_valid) == len(want)
        for (wt, we, wn), (gt, ge, gn) in zip(want, got_valid):
            assert we == ge and wn == gn and abs(wt - gt) < 1e-6
        # padding after valid entries
        n_valid = len(got_valid)
        assert all(out_eid[q, j] == -1 for j in range(n_valid, K))


def test_sample_uniform_properties():
    src, dst, t = _stream(n_edges=3000, n_nodes=80, seed=3)
    N, K = 80, 5
    indptr, indices, eid, ts = hostops.build_tcsr(src, dst, t, N)
    nodes = np.arange(N, dtype=np.int32)
    times = np.full(N, float(t[-1] + 1), np.float32)
    nbr, out_eid, out_ts = hostops.sample_uniform(
        indptr, indices, eid, ts, nodes, times, K, seed=7)
    # determinism
    nbr2, out_eid2, _ = hostops.sample_uniform(
        indptr, indices, eid, ts, nodes, times, K, seed=7)
    np.testing.assert_array_equal(out_eid, out_eid2)
    # every valid sample is a genuine earlier event of the node
    for q in range(N):
        lo, hi = indptr[q], indptr[q + 1]
        valid_eids = set(eid[lo:hi].tolist())
        for j in range(K):
            if out_eid[q, j] >= 0:
                assert out_eid[q, j] in valid_eids
            else:
                assert hi == lo  # only empty-history nodes pad
