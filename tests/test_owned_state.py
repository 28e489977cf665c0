"""Node-range-owned streaming state (parallel/owned_state.py) —
SURVEY.md §7 phase-5 / VERDICT r3 item 5.

Proves the owner-partitioned maintenance is (a) exact: 4 hosts'
assembled rows equal the serial StreamPacker's state after every batch;
(b) scalable: each host's heavy cache-merge work ≈ total/4; and (c)
sufficient for packing: boundary-gathered rows + clocks reproduce the
serial packer's cache Δt inputs for an arbitrary root set.
"""
import numpy as np
import pytest

from tgb_tgn_dgl_tpu.data.dataset import synthetic
from tgb_tgn_dgl_tpu.data.dependency import get_block
from tgb_tgn_dgl_tpu.data.packer import PackerConfig, StreamPacker
from tgb_tgn_dgl_tpu.parallel.owned_state import (
    NativeNodeRangeOwnedState, NodeRangeOwnedState, gather_rows,
    native_available)

IMPLS = ["numpy"] + (["native"] if native_available() else [])


def _owner_cls(impl):
    return (NativeNodeRangeOwnedState if impl == "native"
            else NodeRangeOwnedState)


@pytest.mark.parametrize("impl", IMPLS)
@pytest.mark.parametrize("eval_tail,S", [(False, 1), (False, 2),
                                         (True, 2)])
def test_owned_state_matches_serial(eval_tail, S, impl):
    OwnerCls = _owner_cls(impl)
    n_hosts = 4
    data = synthetic("owned", num_edges=1600, num_nodes=200, msg_dim=4,
                     num_neg=3, seed=17)
    B, K = 100, 5
    N = data.num_nodes
    cfg = PackerConfig(num_neighbors=K, batch_size=B, mailbox_size=S)
    serial = StreamPacker(N, cfg)
    owners = [OwnerCls(N, n_hosts, h, K, S)
              for h in range(n_hosts)]
    rng = np.random.default_rng(3)

    n_batches = 16
    for bi in range(n_batches):
        rows = np.arange(bi * B, (bi + 1) * B)
        src, dst, t = data.src[rows], data.dst[rows], data.t[rows]
        blk = get_block(src, dst)
        em = eval_tail and bi >= n_batches - 4     # streaming eval tail
        neg = rng.integers(0, N, (B, 3)).astype(np.int32) if em \
            else rng.integers(0, N, B).astype(np.int32)
        serial.pack(src, dst, t, rows, blk, neg, eval_mode=em)
        for ow in owners:
            ow.apply_batch(src, dst, t, blk, neg, e_id=rows,
                           eval_mode=em)
        # row-for-row equality of the full partitioned state
        for ow in owners:
            sl = slice(ow.lo, ow.hi)
            np.testing.assert_array_equal(ow.cache_eid,
                                          serial.cache_eid[sl])
            np.testing.assert_array_equal(ow.cache_nbr,
                                          serial.cache_nbr[sl])
            np.testing.assert_array_equal(ow.cache_t,
                                          serial.cache_t[sl])
            np.testing.assert_array_equal(ow.clock, serial.clock[sl])
            np.testing.assert_array_equal(ow.mail_ptr,
                                          serial.mail_ptr[sl])

    # scalability: heavy merge work partitions ~1/n per host (the node
    # universe is Zipf-skewed, so allow generous slack; the invariant is
    # that NO host does O(total) work like the replicated replay does)
    total = sum(ow.merge_entries for ow in owners)
    assert total == 2 * B * n_batches     # every endpoint exactly once
    for ow in owners:
        assert ow.merge_entries < 0.55 * total, (
            [o.merge_entries for o in owners])


@pytest.mark.parametrize("impl", IMPLS)
def test_gather_rows_feeds_packing(impl):
    """Boundary exchange sufficiency: for an arbitrary root set, rows +
    clocks gathered from owners reproduce the serial packer's cache-edge
    inputs (neighbor ids, feature e_ids, Δt = c_t − clock[c_nbr])."""
    OwnerCls = _owner_cls(impl)
    n_hosts = 4
    data = synthetic("owned-pack", num_edges=800, num_nodes=160,
                     msg_dim=4, num_neg=2, seed=23)
    B, K, S = 100, 6, 1
    N = data.num_nodes
    serial = StreamPacker(N, PackerConfig(num_neighbors=K, batch_size=B,
                                          mailbox_size=S))
    owners = [OwnerCls(N, n_hosts, h, K, S)
              for h in range(n_hosts)]
    rng = np.random.default_rng(9)
    for bi in range(6):
        rows = np.arange(bi * B, (bi + 1) * B)
        src, dst, t = data.src[rows], data.dst[rows], data.t[rows]
        blk = get_block(src, dst)
        neg = rng.integers(0, N, B).astype(np.int32)
        serial.pack(src, dst, t, rows, blk, neg)
        for ow in owners:
            ow.apply_batch(src, dst, t, blk, neg, e_id=rows)

    roots = np.unique(rng.integers(0, N, 120))
    nbr, eid, ct, clock_roots, nbytes = gather_rows(owners, roots)
    np.testing.assert_array_equal(nbr, serial.cache_nbr[roots])
    np.testing.assert_array_equal(eid, serial.cache_eid[roots])
    np.testing.assert_array_equal(ct, serial.cache_t[roots])
    np.testing.assert_array_equal(clock_roots, serial.clock[roots])
    assert nbytes == len(roots) * (K * 16 + 4)
    # second round: clocks of the cache neighbors resolve the Δt column
    valid = eid >= 0
    nbr_nodes = np.unique(nbr[valid])
    _, _, _, nbr_clock, _ = gather_rows(owners, nbr_nodes)
    loc = np.searchsorted(nbr_nodes, nbr)
    dt = np.where(valid, ct - nbr_clock[np.minimum(loc, len(nbr_nodes)
                                                   - 1)], 0.0)
    want = np.where(valid,
                    serial.cache_t[roots]
                    - serial.clock[serial.cache_nbr[roots]], 0.0)
    np.testing.assert_allclose(dt, want)


@pytest.mark.parametrize("scratch_impl", ["numpy", "native"])
@pytest.mark.parametrize("impl", IMPLS)
def test_pack_with_gathered_state_matches_replicated(impl, scratch_impl):
    """Owned-mode packing end-to-end: a batch packed against
    boundary-gathered owner state (pack_with_gathered_state) must
    produce the SAME wire, bit-for-bit, as the replicated protocol's
    pack on a fully materialized serial packer — across train batches,
    a mailbox ring, and an eval tail with multi-negatives.  Also checks
    the borrowed scratch packer returns to its default state."""
    from tgb_tgn_dgl_tpu.parallel.owned_state import (
        gather_rows, pack_with_gathered_state)

    if scratch_impl == "native":
        from tgb_tgn_dgl_tpu.data import native_packer
        if not native_packer.available():
            pytest.skip("native packer unavailable")
    OwnerCls = _owner_cls(impl)
    n_hosts = 3
    data = synthetic("owned-gp", num_edges=1200, num_nodes=150,
                     msg_dim=4, num_neg=3, seed=31)
    B, K, S = 120, 5, 2
    N = data.num_nodes
    cfg = PackerConfig(num_neighbors=K, batch_size=B, mailbox_size=S,
                       max_intra_block=8)
    serial = StreamPacker(N, cfg)
    if scratch_impl == "native":
        from tgb_tgn_dgl_tpu.data.native_packer import NativeStreamPacker
        scratch = NativeStreamPacker(N, cfg)
    else:
        scratch = StreamPacker(N, cfg)
    owners = [OwnerCls(N, n_hosts, h, K, S) for h in range(n_hosts)]
    rng = np.random.default_rng(7)

    n_batches = 10
    for bi in range(n_batches):
        rows = np.arange(bi * B, (bi + 1) * B)
        src, dst, t = data.src[rows], data.dst[rows], data.t[rows]
        blk = get_block(src, dst)
        em = bi >= n_batches - 3
        neg = (rng.integers(0, N, (B, 3)) if em
               else rng.integers(0, N, B)).astype(np.int32)
        # owned path FIRST (reads owner state = pre-batch, like serial)
        got, giw, xbytes = pack_with_gathered_state(
            scratch, owners, src, dst, t, rows, blk, neg, eval_mode=em)
        want, wiw = serial.pack_wire(src, dst, t, rows, blk, neg,
                                     eval_mode=em)
        assert giw == wiw
        assert xbytes > 0
        for f in type(want)._fields:
            a, b = getattr(want, f), getattr(got, f)
            if a is None and b is None:
                continue
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"batch {bi} eval={em} field {f}")
        # advance authoritative state
        for ow in owners:
            ow.apply_batch(src, dst, t, blk, neg, e_id=rows, eval_mode=em)
        # borrowed scratch returned to defaults
        assert np.all(np.asarray(scratch.cache_eid) == -1)
        assert np.all(np.asarray(scratch.clock) == 0.0)
        assert np.all(np.asarray(scratch.mail_ptr) == 0)
    # owners track the serial packer (sanity on top of the other tests)
    nbr, eid, ct, clock_r, _ = gather_rows(owners, np.arange(N))
    np.testing.assert_array_equal(eid, serial.cache_eid)
    np.testing.assert_array_equal(clock_r, serial.clock)
