"""Bit-exact parity: NativeStreamPacker (csrc/packer.cpp) vs the numpy
StreamPacker oracle, across train batches, eval batches (2-D negatives),
resets and snapshot/restore."""
import numpy as np
import pytest

from tgb_tgn_dgl_tpu.data.build_hostops import build_if_needed
from tgb_tgn_dgl_tpu.data.dataset import synthetic
from tgb_tgn_dgl_tpu.data.dependency import get_block
from tgb_tgn_dgl_tpu.data.packer import Pack, PackerConfig, StreamPacker

pytestmark = pytest.mark.skipif(not build_if_needed(),
                                reason="C++ toolchain unavailable")


def _assert_packs_equal(a: Pack, b: Pack, ctx=""):
    for f in Pack._fields:
        va, vb = getattr(a, f), getattr(b, f)
        if isinstance(va, np.ndarray):
            np.testing.assert_array_equal(
                np.asarray(va), np.asarray(vb),
                err_msg=f"{ctx}: field {f} differs")
        else:
            assert va == vb, f"{ctx}: field {f}: {va} != {vb}"


def _run_parity(mailbox_size=1, max_intra=None, eval_every=0, num_neg=3,
                batches=6, batch_size=150, seed=0):
    data = synthetic("tgbl-wiki-small", num_edges=batch_size * batches,
                     num_nodes=80, msg_dim=4, num_neg=num_neg, seed=seed)
    from tgb_tgn_dgl_tpu.data.native_packer import NativeStreamPacker
    cfg = PackerConfig(num_neighbors=6, batch_size=batch_size,
                       max_intra_block=max_intra,
                       mailbox_size=mailbox_size)
    py = StreamPacker(data.num_nodes, cfg)
    cc = NativeStreamPacker(data.num_nodes, cfg)
    rng = np.random.default_rng(1)
    for bi in range(batches):
        rows = np.arange(bi * batch_size, (bi + 1) * batch_size)
        src, dst, t = data.src[rows], data.dst[rows], data.t[rows]
        blocks = get_block(src, dst)
        if eval_every and bi % eval_every == 1:
            neg = rng.choice(data.unique_dst(),
                             (batch_size, num_neg)).astype(np.int32)
            em = True
        else:
            neg = rng.choice(data.unique_dst(), batch_size).astype(np.int32)
            em = False
        pa = py.pack(src, dst, t, rows, blocks, neg, eval_mode=em)
        pb = cc.pack(src, dst, t, rows, blocks, neg, eval_mode=em)
        _assert_packs_equal(pa, pb, ctx=f"batch {bi} eval={em}")
        # state parity
        np.testing.assert_array_equal(py.cache_eid, cc.cache_eid,
                                      err_msg=f"batch {bi} cache_eid")
        np.testing.assert_array_equal(py.cache_nbr, cc.cache_nbr)
        np.testing.assert_allclose(py.cache_t, cc.cache_t)
        np.testing.assert_allclose(py.clock, cc.clock)
        np.testing.assert_array_equal(py.mail_ptr, cc.mail_ptr)
        assert py.cur_e_id == cc.cur_e_id


def test_parity_train():
    _run_parity()


def test_parity_eval_negatives():
    _run_parity(eval_every=2, num_neg=4)


def test_parity_mailbox_ring():
    _run_parity(mailbox_size=3)


def test_parity_intra_cap():
    _run_parity(max_intra=2)


def test_parity_after_reset_and_restore():
    data = synthetic("tgbl-wiki-small", num_edges=400, num_nodes=50,
                     msg_dim=4, num_neg=2)
    from tgb_tgn_dgl_tpu.data.native_packer import NativeStreamPacker
    cfg = PackerConfig(num_neighbors=4, batch_size=100)
    py = StreamPacker(data.num_nodes, cfg)
    cc = NativeStreamPacker(data.num_nodes, cfg)
    rng = np.random.default_rng(2)
    for bi in range(2):
        rows = np.arange(bi * 100, (bi + 1) * 100)
        src, dst, t = data.src[rows], data.dst[rows], data.t[rows]
        blocks = get_block(src, dst)
        neg = rng.choice(data.unique_dst(), 100).astype(np.int32)
        py.pack(src, dst, t, rows, blocks, neg)
        cc.pack(src, dst, t, rows, blocks, neg)
    snap_py, snap_cc = py.snapshot(), cc.snapshot()
    py.reset_cache(); cc.reset_cache()
    np.testing.assert_array_equal(py.cache_eid, cc.cache_eid)
    assert py.cur_e_id == cc.cur_e_id == 0
    py.restore(snap_py); cc.restore(snap_cc)
    np.testing.assert_array_equal(py.cache_eid, cc.cache_eid)
    np.testing.assert_allclose(py.clock, cc.clock)
    # continue packing after restore — still identical
    rows = np.arange(200, 300)
    src, dst, t = data.src[rows], data.dst[rows], data.t[rows]
    blocks = get_block(src, dst)
    neg = rng.choice(data.unique_dst(), 100).astype(np.int32)
    pa = py.pack(src, dst, t, rows, blocks, neg)
    pb = cc.pack(src, dst, t, rows, blocks, neg)
    _assert_packs_equal(pa, pb, "post-restore")


def test_native_packer_speed():
    """The native packer must beat numpy by a wide margin on a realistic
    batch (this is its reason to exist)."""
    import time
    data = synthetic("tgbl-wiki", num_edges=20000)
    from tgb_tgn_dgl_tpu.data.native_packer import NativeStreamPacker
    cfg = PackerConfig(num_neighbors=10, batch_size=2000,
                       max_intra_block=32)
    py = StreamPacker(data.num_nodes, cfg)
    cc = NativeStreamPacker(data.num_nodes, cfg)
    rng = np.random.default_rng(3)

    def run(packer):
        packer.reset_cache()
        t0 = time.perf_counter()
        for bi in range(10):
            rows = np.arange(bi * 2000, (bi + 1) * 2000)
            src, dst, t = data.src[rows], data.dst[rows], data.t[rows]
            blocks = get_block(src, dst)
            neg = rng.choice(data.unique_dst(), 2000).astype(np.int32)
            packer.pack(src, dst, t, rows, blocks, neg)
        return time.perf_counter() - t0

    t_py = run(py)
    t_cc = run(cc)
    assert t_cc < t_py / 3, f"native {t_cc:.3f}s vs numpy {t_py:.3f}s"


def test_native_wire_matches_python_wire():
    """packer_pack_fill_wire output must equal pack_to_wire(numpy pack)."""
    from tgb_tgn_dgl_tpu.data.native_packer import NativeStreamPacker
    from tgb_tgn_dgl_tpu.ops.wire import pack_to_wire

    data = synthetic("tgbl-wiki-small", num_edges=600, num_nodes=70,
                     msg_dim=4, num_neg=3, seed=5)
    cfg = PackerConfig(num_neighbors=5, batch_size=150, max_intra_block=8,
                       mailbox_size=2)
    py = StreamPacker(data.num_nodes, cfg)
    cc = NativeStreamPacker(data.num_nodes, cfg)
    rng = np.random.default_rng(6)
    for bi in range(4):
        rows = np.arange(bi * 150, (bi + 1) * 150)
        src, dst, t = data.src[rows], data.dst[rows], data.t[rows]
        blocks = get_block(src, dst)
        em = bi == 2
        if em:
            neg = rng.choice(data.unique_dst(), (150, 3)).astype(np.int32)
        else:
            neg = rng.choice(data.unique_dst(), 150).astype(np.int32)
        pw, piw = py.pack_wire(src, dst, t, rows, blocks, neg, eval_mode=em)
        cw, ciw = cc.pack_wire(src, dst, t, rows, blocks, neg, eval_mode=em)
        assert piw == ciw, f"batch {bi}: intra width {piw} != {ciw}"
        for f in type(pw)._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(pw, f)), np.asarray(getattr(cw, f)),
                err_msg=f"batch {bi} wire field {f}")


def test_native_dedup_wire_matches_python():
    """NativeStreamPacker.pack_wire_dedup must match the numpy oracle
    bit-for-bit (fields, dtypes, buckets, advanced stream state)."""
    from tgb_tgn_dgl_tpu.data.dependency import dependency_aware_batch
    from tgb_tgn_dgl_tpu.data.native_packer import NativeStreamPacker

    for (eval_mode, M, S, seed, cap) in [
            (False, 1, 1, 0, 8), (False, 1, 3, 1, 8), (True, 5, 1, 2, 8),
            (False, 2, 2, 3, 8), (True, 3, 4, 4, None)]:
        r = np.random.default_rng(seed)
        N, B, E = 90, 250, 800
        cfg = PackerConfig(num_neighbors=6, batch_size=B,
                           max_intra_block=cap, mailbox_size=S)
        a = StreamPacker(N, cfg)
        b = NativeStreamPacker(N, cfg)
        t_all = np.sort(r.uniform(0, 1e6, E)).astype(np.float32)
        src = r.integers(0, N, E).astype(np.int32)
        dst = r.integers(0, N, E).astype(np.int32)
        blocks = dependency_aware_batch(src, dst, B)
        for lo in range(0, E, B):
            hi = min(lo + B, E)
            rows = np.arange(lo, hi)
            neg = r.integers(0, N, (hi - lo, M)).astype(np.int32)
            if M == 1:
                neg = neg[:, 0]
            args = (src[lo:hi], dst[lo:hi], t_all[lo:hi], rows,
                    blocks[lo:hi], neg)
            wa = a.pack_wire_dedup(*args, eval_mode=eval_mode)
            wb = b.pack_wire_dedup(*args, eval_mode=eval_mode)
            assert (wa is None) == (wb is None)
            if wa is None:
                continue
            wire_a, Pa = wa
            wire_b, Pb = wb
            assert Pa == Pb
            for f in wire_a._fields:
                x, y = getattr(wire_a, f), getattr(wire_b, f)
                if x is None and y is None:    # optional eval-lean fields
                    continue
                assert x.dtype == y.dtype, (f, x.dtype, y.dtype)
                np.testing.assert_array_equal(
                    x, y, err_msg=f"eval={eval_mode} M={M} S={S} "
                                  f"batch@{lo} field {f}")
        for nm in ("cache_nbr", "cache_eid", "cache_t", "clock",
                   "mail_ptr"):
            np.testing.assert_array_equal(getattr(a, nm), getattr(b, nm),
                                          err_msg=nm)
        assert a.cur_e_id == b.cur_e_id


def test_insert_out_of_order_eid_matches_oracle():
    """packer_insert's O(K) merge assumes non-decreasing e_id per call;
    an out-of-order call must DETECT this and degrade to per-event
    inserts that still match the lexsorting numpy oracle bit-for-bit
    (ADVICE r3: previously silently wrong)."""
    from tgb_tgn_dgl_tpu.data.native_packer import NativeStreamPacker

    N, K = 40, 5
    cfg = PackerConfig(num_neighbors=K, batch_size=64)
    py = StreamPacker(N, cfg)
    cc = NativeStreamPacker(N, cfg)
    rng = np.random.default_rng(5)
    for trial in range(4):
        B = 30
        src = rng.integers(0, N, B).astype(np.int32)
        dst = rng.integers(0, N, B).astype(np.int32)
        t = np.sort(rng.random(B).astype(np.float32)) + trial
        e_id = rng.permutation(B).astype(np.int64) + trial * B  # shuffled
        py.insert(src, dst, t, e_id=e_id)
        cc.insert(src, dst, t, e_id=e_id)
        np.testing.assert_array_equal(py.cache_eid, cc.cache_eid, trial)
        np.testing.assert_array_equal(py.cache_nbr, cc.cache_nbr)
        np.testing.assert_array_equal(py.cache_t, cc.cache_t)
        assert py.cur_e_id == cc.cur_e_id


def test_async_pack_ahead_bit_exact():
    """The C++ async pack-ahead (submit/wait/read) must produce wires
    BIT-IDENTICAL to the synchronous pack_wire_dedup path, with equal
    post-stream state — same events, two packers, one driven async."""
    from tgb_tgn_dgl_tpu.data.dependency import dependency_aware_batch
    from tgb_tgn_dgl_tpu.data.native_packer import NativeStreamPacker

    data = synthetic("async-par", num_edges=900, num_nodes=120, msg_dim=4,
                     num_neg=1, seed=2)
    B = 150
    cfg = PackerConfig(num_neighbors=6, batch_size=B, mailbox_size=2)
    a = NativeStreamPacker(data.num_nodes, cfg)     # sync reference
    b = NativeStreamPacker(data.num_nodes, cfg)     # async
    if not b.async_available():
        pytest.skip("async API not in libhostops.so")
    rng = np.random.default_rng(4)
    blocks = dependency_aware_batch(data.src, data.dst, B)
    pend = None
    got = []
    want = []
    for lo in range(0, 900, B):
        rows = np.arange(lo, lo + B)
        src, dst, t = data.src[rows], data.dst[rows], data.t[rows]
        neg = rng.integers(0, data.num_nodes, B).astype(np.int32)
        args = (src, dst, t, rows, blocks[rows], neg)
        want.append(a.pack_wire_dedup(*args))
        if pend is not None:
            got.append(b.pack_wire_dedup_fetch())
        assert b.pack_wire_dedup_submit(*args)
        pend = args
    got.append(b.pack_wire_dedup_fetch())
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        assert (g is None) == (w is None)
        gw, gp = g
        ww, wp = w
        assert gp == wp
        for f in gw._fields:
            x, y = getattr(gw, f), getattr(ww, f)
            if x is None and y is None:        # optional eval-lean fields
                continue
            assert x.dtype == y.dtype, (i, f, x.dtype, y.dtype)
            np.testing.assert_array_equal(x, y,
                                          err_msg=f"batch {i} field {f}")
    for nm in ("cache_nbr", "cache_eid", "cache_t", "clock", "mail_ptr"):
        np.testing.assert_array_equal(getattr(a, nm), getattr(b, nm),
                                      err_msg=nm)
    assert a.cur_e_id == b.cur_e_id


def test_async_interleaved_sync_calls_wait():
    """Synchronous packer entry points must transparently wait for an
    outstanding async job (wait_idle) — state reads after submit see the
    COMPLETED pack."""
    from tgb_tgn_dgl_tpu.data.dependency import get_block
    from tgb_tgn_dgl_tpu.data.native_packer import NativeStreamPacker

    data = synthetic("async-sync", num_edges=200, num_nodes=50, msg_dim=4,
                     num_neg=1, seed=3)
    B = 100
    cfg = PackerConfig(num_neighbors=4, batch_size=B)
    p = NativeStreamPacker(data.num_nodes, cfg)
    if not p.async_available():
        pytest.skip("async API not in libhostops.so")
    rows = np.arange(B)
    src, dst, t = data.src[rows], data.dst[rows], data.t[rows]
    neg = np.zeros(B, np.int32)
    assert p.pack_wire_dedup_submit(src, dst, t, rows,
                                    get_block(src, dst), neg)
    # state access while the job may still be running: must block until
    # the pack completed, then reflect the advanced stream
    assert p.cur_e_id == B
    wire, _ = p.pack_wire_dedup_fetch()
    assert wire is not None
