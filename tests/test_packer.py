"""The host packer vs. an independent numpy simulator of the reference's
per-batch mechanics (growing DGL graph + in_subgraph + time_assoc clocks,
model_utils.py:61-157, epoch_utils.py:186-304).

The oracle deliberately uses the reference's representation (an explicit
growing edge list per batch) rather than the packer's dense-grid layout,
so agreement is meaningful.
"""
import numpy as np
import pytest

from tgb_tgn_dgl_tpu.data.dependency import get_block
from tgb_tgn_dgl_tpu.data.packer import (KIND_CACHE, KIND_INTRA, KIND_SELF,
                                         Pack, PackerConfig, StreamPacker)


class ReferenceSimulator:
    """Growing-edge-list emulation of the reference forward's edge
    semantics.  For each (block, root) returns the multiset of in-edges
    as (src_node, kind, feat_ref, dt)."""

    def __init__(self, num_nodes, k):
        self.N, self.K = num_nodes, k
        self.store = {i: [] for i in range(num_nodes)}  # (eid, nbr, t)
        self.cur = 0
        self.clock = np.zeros(num_nodes, np.float64)

    def run_batch(self, src, dst, t, ev_idx, blocks, neg, eval_mode):
        neg2d = np.asarray(neg).reshape(len(src), -1)
        k = blocks.max() + 1
        # graph build at batch start: cache edges of batch nodes + self-loops
        batch_nodes = np.unique(np.concatenate([src, dst, neg2d.ravel()]))
        edges = []  # (src, dst, kind, feat, t_edge)
        for u in batch_nodes:
            for (eid, v, tt) in sorted(self.store[int(u)])[-self.K:]:
                edges.append((v, int(u), KIND_CACHE, eid, tt))
        for u in batch_nodes:
            edges.append((int(u), int(u), KIND_SELF, -1, 0.0))

        out = {}  # (block, root) -> sorted list of tuples
        for i in range(k):
            sel = np.nonzero(blocks == i)[0]
            ti = t[sel]
            if eval_mode:
                self.clock[:] = ti.max()
            else:
                for e in sel:
                    for n in neg2d[e]:
                        self.clock[n] = t[e]
            for e in sel:
                self.clock[dst[e]] = t[e]
            for e in sel:
                self.clock[src[e]] = t[e]
            roots = np.unique(np.concatenate(
                [src[sel], dst[sel], neg2d[sel].ravel()]))
            for r in roots:
                rows = [(s, kind, feat, round(te - self.clock[s], 4))
                        for (s, d, kind, feat, te) in edges if d == r]
                out[(i, int(r))] = sorted(rows)
            # grow the graph with this block's positive edges (both dirs)
            for e in sel:
                edges.append((int(src[e]), int(dst[e]), KIND_INTRA,
                              int(ev_idx[e]), float(t[e])))
                edges.append((int(dst[e]), int(src[e]), KIND_INTRA,
                              int(ev_idx[e]), float(t[e])))
        # post-batch insert into recency store
        for j in range(len(src)):
            e = int(ev_idx[j])
            self.store[int(dst[j])].append((e, int(src[j]), float(t[j])))
            self.store[int(src[j])].append((e, int(dst[j]), float(t[j])))
        for u in set(map(int, src)) | set(map(int, dst)):
            self.store[u] = sorted(self.store[u])[-self.K:]
        self.cur += len(src)
        return out


def _compare(packer, sim, src, dst, t, ev_idx, blocks, neg, eval_mode):
    ref = sim.run_batch(src, dst, t, ev_idx, blocks, neg, eval_mode)
    pack = packer.pack(src, dst, t, ev_idx, blocks, neg,
                       eval_mode=eval_mode)
    # map root slots to (block, node): slots are block-major, and within a
    # block sorted by node id (np.unique) — recover block boundaries from
    # the sorted-ascending-restart pattern is fragile, so recompute sets:
    neg2d = np.asarray(neg).reshape(len(src), -1)
    k = blocks.max() + 1
    slot = 0
    for i in range(k):
        sel = blocks == i
        roots = np.unique(np.concatenate(
            [src[sel], dst[sel], neg2d[sel].ravel()]))
        for r in roots:
            assert pack.root_valid[slot]
            assert pack.root_nid[slot] == r
            kinds = pack.nbr_kind[slot]
            valid = kinds != 0
            rows = sorted(
                (int(pack.nbr_nid[slot, j]), int(kinds[j]),
                 int(pack.nbr_feat[slot, j]) if kinds[j] != KIND_SELF else -1,
                 round(float(pack.nbr_dt[slot, j]), 4))
                for j in np.nonzero(valid)[0])
            assert rows == ref[(i, int(r))], (
                f"block {i} root {r}: {rows} != {ref[(i, int(r))]}")
            slot += 1
    assert pack.num_real_roots == slot
    assert not pack.root_valid[slot:].any()
    # event -> slot maps point at the right (block, node) slots
    for e in range(len(src)):
        assert pack.root_nid[pack.ev_src_slot[e]] == src[e]
        assert pack.root_nid[pack.ev_pos_slot[e]] == dst[e]
        ns = np.atleast_1d(np.asarray(pack.ev_neg_slot)[e])
        np.testing.assert_array_equal(pack.root_nid[ns], neg2d[e])
    return pack


@pytest.mark.parametrize("eval_mode,m", [(False, 1), (True, 5)])
def test_packer_matches_reference_simulator(eval_mode, m):
    rng = np.random.default_rng(42)
    N, K, B = 25, 3, 20
    packer = StreamPacker(N, PackerConfig(num_neighbors=K, batch_size=B,
                                          root_bucket_lo=8))
    sim = ReferenceSimulator(N, K)
    row = 0
    for step in range(6):
        src = rng.integers(0, N, B).astype(np.int32)
        dst = rng.integers(0, N, B).astype(np.int32)
        t = (np.arange(B) + step * B).astype(np.float32)
        ev_idx = np.arange(row, row + B, dtype=np.int64)
        row += B
        blocks = get_block(src, dst)
        if m == 1:
            neg = rng.integers(0, N, B).astype(np.int32)
        else:
            neg = rng.integers(0, N, (B, m)).astype(np.int32)
        _compare(packer, sim, src, dst, t, ev_idx, blocks, neg, eval_mode)


def test_packer_epoch_reset_keeps_clocks():
    rng = np.random.default_rng(0)
    N, K, B = 10, 2, 8
    packer = StreamPacker(N, PackerConfig(num_neighbors=K, batch_size=B))
    src = rng.integers(0, N, B).astype(np.int32)
    dst = rng.integers(0, N, B).astype(np.int32)
    t = np.arange(B, dtype=np.float32)
    blocks = get_block(src, dst)
    packer.pack(src, dst, t, np.arange(B), blocks,
                rng.integers(0, N, B).astype(np.int32))
    clock_before = packer.clock.copy()
    packer.reset_cache()
    assert (packer.cache_eid == -1).all()
    assert packer.cur_e_id == 0
    np.testing.assert_array_equal(packer.clock, clock_before)


def test_pack_padding_shapes():
    N, K, B = 10, 2, 16
    packer = StreamPacker(N, PackerConfig(num_neighbors=K, batch_size=B,
                                          root_bucket_lo=8))
    src = np.array([0, 1], np.int32)
    dst = np.array([2, 3], np.int32)
    t = np.array([1.0, 2.0], np.float32)
    blocks = get_block(src, dst)
    pack = packer.pack(src, dst, t, np.arange(2), blocks,
                       np.array([4, 5], np.int32))
    assert pack.ev_src.shape == (B,)
    assert pack.ev_valid.sum() == 2
    r, kp = pack.nbr_nid.shape
    assert r % 8 == 0 and kp == K + 1  # no intra edges in 1-block batch
