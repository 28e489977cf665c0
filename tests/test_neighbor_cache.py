"""Functional neighbor cache vs. a numpy oracle of the reference
LastNeighborLoader semantics (neighbor_loader.py:15-109), plus equivalence
with the host packer's cache emulation."""
import numpy as np
import jax
import jax.numpy as jnp

from tgb_tgn_dgl_tpu.ops.neighbor_cache import (init_neighbor_cache,
                                                insert_events,
                                                query_neighbors,
                                                reset_neighbor_cache)
from tgb_tgn_dgl_tpu.data.packer import PackerConfig, StreamPacker


class NumpyLastNeighborOracle:
    """Straight numpy re-statement of the reference ring buffer: per node
    keep the K entries with largest e_id among undirected incidences."""

    def __init__(self, n, k):
        self.n, self.k = n, k
        self.store = {i: [] for i in range(n)}  # list of (eid, nbr, t)
        self.cur = 0

    def insert(self, src, dst, t):
        for i in range(len(src)):
            e = self.cur + i
            self.store[int(dst[i])].append((e, int(src[i]), float(t[i])))
            self.store[int(src[i])].append((e, int(dst[i]), float(t[i])))
        self.cur += len(src)
        for u in set(map(int, src)) | set(map(int, dst)):
            self.store[u] = sorted(self.store[u])[-self.k:]

    def query(self, n_id):
        nbrs = np.zeros((len(n_id), self.k), np.int64)
        eids = np.full((len(n_id), self.k), -1, np.int64)
        ts = np.full((len(n_id), self.k), -1.0, np.float32)
        for j, u in enumerate(n_id):
            for jj, (e, v, tt) in enumerate(sorted(self.store[int(u)],
                                                   reverse=True)):
                nbrs[j, jj], eids[j, jj], ts[j, jj] = v, e, tt
        return nbrs, eids, ts


def _sorted_rows(nbr, eid, t):
    """Canonicalize row order (slot order within K is impl-defined)."""
    order = np.argsort(-eid, axis=1, kind="stable")
    return (np.take_along_axis(nbr, order, 1),
            np.take_along_axis(eid, order, 1),
            np.take_along_axis(t, order, 1))


def test_cache_matches_oracle_random_stream():
    rng = np.random.default_rng(0)
    N, K, B, steps = 50, 4, 16, 12
    state = init_neighbor_cache(N, K)
    oracle = NumpyLastNeighborOracle(N, K)
    packer = StreamPacker(N, PackerConfig(num_neighbors=K, batch_size=B))
    insert_jit = jax.jit(insert_events)
    for s in range(steps):
        src = rng.integers(0, N, B).astype(np.int32)
        dst = rng.integers(0, N, B).astype(np.int32)
        t = np.sort(rng.random(B).astype(np.float32)) + s
        state = insert_jit(state, jnp.array(src), jnp.array(dst),
                           jnp.array(t))
        oracle.insert(src, dst, t)
        packer.insert(src, dst, t)

    n_id = np.arange(N)
    nbrs, eids, ts, mask = (np.asarray(x) for x in
                            query_neighbors(state, jnp.array(n_id)))
    o_nbrs, o_eids, o_ts = oracle.query(n_id)
    a = _sorted_rows(nbrs, eids, ts)
    b = _sorted_rows(o_nbrs, o_eids, o_ts)
    valid = b[1] >= 0
    np.testing.assert_array_equal(a[1], b[1])
    np.testing.assert_array_equal(a[0][valid], b[0][valid])
    np.testing.assert_allclose(a[2][valid], b[2][valid], rtol=1e-6)
    # host packer cache agrees too
    c = _sorted_rows(packer.cache_nbr, packer.cache_eid, packer.cache_t)
    np.testing.assert_array_equal(c[1], b[1])
    np.testing.assert_array_equal(c[0][valid], b[0][valid])


def test_cache_duplicate_nodes_in_batch():
    # >K events for one node in a single batch: last-K win deterministically
    N, K = 4, 3
    state = init_neighbor_cache(N, K)
    src = jnp.array([0, 0, 0, 0, 0], jnp.int32)
    dst = jnp.array([1, 2, 3, 1, 2], jnp.int32)
    t = jnp.arange(5, dtype=jnp.float32)
    state = insert_events(state, src, dst, t)
    nbrs, eids, ts, mask = query_neighbors(state, jnp.array([0]))
    got = sorted(np.asarray(eids)[0].tolist())
    assert got == [2, 3, 4]


def test_reset_state():
    state = init_neighbor_cache(5, 2)
    state = insert_events(state, jnp.array([0], jnp.int32),
                          jnp.array([1], jnp.int32), jnp.array([1.0]))
    state = reset_neighbor_cache(state)
    assert int(state.cur_e_id) == 0
    assert np.all(np.asarray(state.e_id) == -1)
