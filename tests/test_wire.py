"""WirePack compaction/expansion must reproduce Pack.device() exactly."""
import numpy as np

import jax

from tgb_tgn_dgl_tpu.data.dataset import synthetic
from tgb_tgn_dgl_tpu.data.dependency import get_block
from tgb_tgn_dgl_tpu.data.packer import PackerConfig, StreamPacker
from tgb_tgn_dgl_tpu.ops.wire import expand_wire, pack_to_wire


def test_wire_roundtrip_exact():
    data = synthetic("tgbl-wiki-small", num_edges=600, num_nodes=80,
                     msg_dim=4, num_neg=3)
    K = 6
    packer = StreamPacker(data.num_nodes, PackerConfig(
        num_neighbors=K, batch_size=150, mailbox_size=2))
    rng = np.random.default_rng(0)
    for bi in range(4):
        rows = np.arange(bi * 150, (bi + 1) * 150)
        src, dst, t = data.src[rows], data.dst[rows], data.t[rows]
        blocks = get_block(src, dst)
        em = bi == 2
        if em:
            neg = rng.choice(data.unique_dst(), (150, 3)).astype(np.int32)
        else:
            neg = rng.choice(data.unique_dst(), 150).astype(np.int32)
        pack = packer.pack(src, dst, t, rows, blocks, neg, eval_mode=em)
        want = pack.device()
        wire = pack_to_wire(pack, K)
        iw = pack.nbr_kind.shape[1] - K - 1
        got = jax.jit(expand_wire, static_argnums=(1, 2, 3))(
            wire, K, iw, data.num_nodes)
        for f in type(want)._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(want, f)), np.asarray(getattr(got, f)),
                err_msg=f"batch {bi} field {f}")


def test_compact_wire_exact():
    """compact→uncompact is the identity on WirePacks, and the expanded
    DevicePack matches Pack.device() bitwise (train, eval, multi-layer,
    empty-mail chunks)."""
    from tgb_tgn_dgl_tpu.ops.wire import compact_wire, uncompact_wire

    data = synthetic("tgbl-wiki-small", num_edges=600, num_nodes=80,
                     msg_dim=4, num_neg=3)
    K = 6
    packer = StreamPacker(data.num_nodes, PackerConfig(
        num_neighbors=K, batch_size=150, mailbox_size=2, layers=2))
    rng = np.random.default_rng(0)
    compacted = 0
    for bi in range(4):
        rows = np.arange(bi * 150, (bi + 1) * 150)
        src, dst, t = data.src[rows], data.dst[rows], data.t[rows]
        blocks = get_block(src, dst)
        em = bi == 2
        if em:
            neg = rng.choice(data.unique_dst(), (150, 3)).astype(np.int32)
        else:
            neg = rng.choice(data.unique_dst(), 150).astype(np.int32)
        wm = bi != 3     # exercise the write_mail=False (eval chunk) path
        wire, iw = packer.pack_wire(src, dst, t, rows, blocks, neg,
                                    eval_mode=em, write_mail=wm)
        cw = compact_wire(wire, data.num_nodes, iw, 2)
        assert cw is not None
        compacted += 1
        # narrow dtypes actually chosen on this small graph
        assert cw.ev_src.dtype == np.uint16
        assert cw.mw_slot.dtype == np.uint8
        assert cw.ia_col.dtype == np.uint8
        assert (sum(np.asarray(a).nbytes for a in cw if a is not None)
                < sum(np.asarray(a).nbytes for a in wire if a is not None))
        back = jax.jit(uncompact_wire, static_argnums=(1,))(
            cw, data.num_nodes)
        for f in type(wire)._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(wire, f)), np.asarray(getattr(back, f)),
                err_msg=f"batch {bi} wire field {f}")
        got = jax.jit(expand_wire, static_argnums=(1, 2, 3))(
            cw, K, iw, data.num_nodes)
        want = jax.jit(expand_wire, static_argnums=(1, 2, 3))(
            wire, K, iw, data.num_nodes)
        for f in type(want)._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(want, f)), np.asarray(getattr(got, f)),
                err_msg=f"batch {bi} pack field {f}")
    assert compacted == 4


def test_compact_wire_wide_fallback():
    """Ranges that exceed uint16 fall back to int32 fields, still exact."""
    from tgb_tgn_dgl_tpu.ops.wire import compact_wire, uncompact_wire

    data = synthetic("tgbl-wiki-small", num_edges=400, num_nodes=80,
                     msg_dim=4)
    K = 4
    big_n = 70001      # pretend node-id space > uint16
    packer = StreamPacker(big_n, PackerConfig(
        num_neighbors=K, batch_size=100, mailbox_size=300))
    rows = np.arange(100)
    src, dst, t = data.src[rows], data.dst[rows], data.t[rows]
    blocks = get_block(src, dst)
    neg = np.random.default_rng(2).choice(
        data.unique_dst(), 100).astype(np.int32)
    wire, iw = packer.pack_wire(src, dst, t, rows, blocks, neg)
    cw = compact_wire(wire, big_n, iw, 300)
    assert cw is not None
    assert cw.ev_src.dtype == np.int32        # N-1 > 0xFFFF
    assert cw.mw_slot.dtype == np.int32       # S > 254
    back = uncompact_wire(cw, big_n)
    for f in type(wire)._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(wire, f)), np.asarray(getattr(back, f)),
            err_msg=f"wire field {f}")


def test_wire_size_reduction():
    data = synthetic("tgbl-wiki", num_edges=30000)
    from tgb_tgn_dgl_tpu.data.native_packer import make_stream_packer
    packer = make_stream_packer(data.num_nodes, PackerConfig(
        num_neighbors=10, batch_size=2000, max_intra_block=32))
    rng = np.random.default_rng(1)
    for bi in range(6):
        rows = np.arange(bi * 2000, (bi + 1) * 2000)
        src, dst, t = data.src[rows], data.dst[rows], data.t[rows]
        blocks = get_block(src, dst)
        neg = rng.choice(data.unique_dst(), 2000).astype(np.int32)
        pack = packer.pack(src, dst, t, rows, blocks, neg)
    wire = pack_to_wire(pack, 10)
    full = sum(np.asarray(a).nbytes for a in pack.device())
    compact = sum(np.asarray(a).nbytes for a in wire)
    assert compact < full / 3, f"wire {compact} vs full {full}"


def test_dedup_wire_exact():
    """expand_dedup(pack_wire_dedup(...)) must reproduce Pack.device()
    bit-for-bit across train/eval modes, multi-negative and mailbox
    sizes — cache rows, intra edges, partner identity and the mailbox
    plan are all re-derived on device from the deduplicated wire."""
    import jax.numpy as jnp

    from tgb_tgn_dgl_tpu.data.dependency import dependency_aware_batch
    from tgb_tgn_dgl_tpu.ops.wire import expand_dedup

    for (eval_mode, M, S, seed) in [
            (False, 1, 1, 1), (False, 1, 3, 2), (True, 7, 1, 3),
            (True, 4, 2, 4), (False, 3, 1, 5)]:
        r = np.random.default_rng(seed)
        N, B, E = 80, 200, 600
        cfg = PackerConfig(num_neighbors=5, batch_size=B,
                           max_intra_block=8, mailbox_size=S)
        pk_a = StreamPacker(N, cfg)
        pk_b = StreamPacker(N, cfg)
        t_all = np.sort(r.uniform(0, 1e6, E)).astype(np.float32)
        src_all = r.integers(0, N, E).astype(np.int32)
        dst_all = r.integers(0, N, E).astype(np.int32)
        blocks_all = dependency_aware_batch(src_all, dst_all, B)
        for lo in range(0, E, B):
            hi = min(lo + B, E)
            rows = np.arange(lo, hi)
            neg = r.integers(0, N, (hi - lo, M)).astype(np.int32)
            if M == 1:
                neg = neg[:, 0]
            args = (src_all[lo:hi], dst_all[lo:hi], t_all[lo:hi], rows,
                    blocks_all[lo:hi], neg)
            pack = pk_a.pack(*args, eval_mode=eval_mode)
            out = pk_b.pack_wire_dedup(*args, eval_mode=eval_mode)
            assert out is not None
            wire, P = out
            assert pack.nbr_kind.shape[1] == cfg.num_neighbors + 1 + P
            want = pack.device()
            got = expand_dedup(jax.tree.map(jnp.asarray, wire),
                               cfg.num_neighbors, P, N)
            for f in type(want)._fields:
                a = getattr(want, f)
                b = getattr(got, f)
                if a is None:
                    assert b is None, f
                    continue
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b).astype(np.asarray(a).dtype),
                    err_msg=f"eval={eval_mode} M={M} S={S} "
                            f"batch@{lo} field {f}")
        # stream state advanced identically on both packers
        for nm in ("cache_nbr", "cache_eid", "cache_t", "clock",
                   "mail_ptr"):
            np.testing.assert_array_equal(getattr(pk_a, nm),
                                          getattr(pk_b, nm), err_msg=nm)
        assert pk_a.cur_e_id == pk_b.cur_e_id


def test_dedup_wire_size_reduction():
    """The dedup wire must ship meaningfully fewer bytes than the
    compact wire on a wiki-like stream (~1.6× fewer at wiki scale; this
    tiny stream dedups less)."""
    from tgb_tgn_dgl_tpu.data.dependency import dependency_aware_batch
    from tgb_tgn_dgl_tpu.ops.wire import compact_wire

    data = synthetic("tgbl-wiki-small", num_edges=4000, num_nodes=300,
                     msg_dim=4, num_neg=1)
    B = 500
    cfg = PackerConfig(num_neighbors=10, batch_size=B, max_intra_block=16)
    pk_a = StreamPacker(data.num_nodes, cfg)
    pk_b = StreamPacker(data.num_nodes, cfg)
    blocks = dependency_aware_batch(data.src, data.dst, B)
    rng = np.random.default_rng(0)
    tot_c = tot_d = 0
    for lo in range(0, 4000, B):
        rows = np.arange(lo, lo + B)
        neg = rng.choice(data.unique_dst(), B).astype(np.int32)
        args = (data.src[rows], data.dst[rows], data.t[rows], rows,
                blocks[rows], neg)
        wire, iw = pk_a.pack_wire(*args)
        cw = compact_wire(wire, data.num_nodes, iw, 1)
        tot_c += sum(np.asarray(a).nbytes for a in cw if a is not None)
        dw, _ = pk_b.pack_wire_dedup(*args)
        tot_d += sum(np.asarray(a).nbytes for a in dw if a is not None)
    assert tot_d < 0.8 * tot_c, (tot_d, tot_c)


def test_dedup_wire_eval_lean_exact():
    """EVAL-LEAN dedup wire: with the three per-slot f32 Δt fields
    stripped (eval_lean_dedup), expand_dedup must re-derive them
    BIT-exactly from the global time table + per-block metadata —
    including the subtle eval clock semantics where the per-block wipe
    is overwritten by the block's own endpoint writes
    (data/packer.py:388-393).  Covers multi-negative chunking, mailbox
    sizes, and a mid-stream state (train batch first)."""
    import jax
    import jax.numpy as jnp

    from tgb_tgn_dgl_tpu.data.dependency import dependency_aware_batch
    from tgb_tgn_dgl_tpu.ops.wire import eval_lean_dedup, expand_dedup

    for (M, S, seed) in [(7, 1, 3), (4, 2, 4), (1, 1, 5)]:
        r = np.random.default_rng(seed)
        N, B, E = 80, 200, 600
        cfg = PackerConfig(num_neighbors=5, batch_size=B,
                           max_intra_block=8, mailbox_size=S)
        pk_a = StreamPacker(N, cfg)
        pk_b = StreamPacker(N, cfg)
        t_all = np.sort(r.uniform(0, 1e6, E)).astype(np.float32)
        src_all = r.integers(0, N, E).astype(np.int32)
        dst_all = r.integers(0, N, E).astype(np.int32)
        blocks_all = dependency_aware_batch(src_all, dst_all, B)
        times_dev = jnp.asarray(t_all)
        for bi, lo in enumerate(range(0, E, B)):
            hi = min(lo + B, E)
            rows = np.arange(lo, hi)
            neg = r.integers(0, N, (hi - lo, M)).astype(np.int32)
            if M == 1:
                neg = neg[:, 0]
            em = bi >= 1                  # train batch first, then eval
            args = (src_all[lo:hi], dst_all[lo:hi], t_all[lo:hi], rows,
                    blocks_all[lo:hi], neg)
            pack = pk_a.pack(*args, eval_mode=em)
            out = pk_b.pack_wire_dedup(*args, eval_mode=em)
            assert out is not None
            wire, P = out
            want = pack.device()
            if em:
                wire = eval_lean_dedup(wire, blocks_all[lo:hi], 64)
                assert wire.cache_dt is None    # lean applied
            got = expand_dedup(jax.tree.map(jnp.asarray, wire),
                               cfg.num_neighbors, P, N,
                               ev_times=times_dev)
            for f in type(want)._fields:
                a = getattr(want, f)
                b = getattr(got, f)
                if a is None:
                    assert b is None, f
                    continue
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b).astype(np.asarray(a).dtype),
                    err_msg=f"lean eval M={M} S={S} batch@{lo} field {f}")


def test_dedup_wire_train_lean_exact():
    """TRAIN-LEAN dedup wire (train_lean_dedup): the device clock grid
    (order-key scatter-max + cummax over blocks + pre-batch clock0)
    must reproduce the packer's pass-2 clock evolution BIT-exactly —
    including the neg → dst → src within-block write order, a node
    written in MULTIPLE blocks (prefix semantics), negatives colliding
    with endpoints, repeated negatives in one block (last-row-wins),
    duplicate timestamps, and cross-batch clock state (every batch
    after the first reads pre-batch clocks the device never saw)."""
    import jax
    import jax.numpy as jnp

    from tgb_tgn_dgl_tpu.data.dependency import dependency_aware_batch
    from tgb_tgn_dgl_tpu.ops.wire import expand_dedup, train_lean_dedup

    for (S, seed) in [(1, 3), (2, 7)]:
        r = np.random.default_rng(seed)
        N, B, E = 60, 150, 600           # small N: heavy node collisions
        cfg = PackerConfig(num_neighbors=5, batch_size=B,
                           max_intra_block=8, mailbox_size=S)
        pk_a = StreamPacker(N, cfg)
        pk_b = StreamPacker(N, cfg)
        t_all = np.sort(r.uniform(0, 1e6, E)).astype(np.float32)
        t_all[100:110] = t_all[100]      # duplicate timestamps
        src_all = r.integers(0, N, E).astype(np.int32)
        dst_all = r.integers(0, N, E).astype(np.int32)
        blocks_all = dependency_aware_batch(src_all, dst_all, B)
        times_dev = jnp.asarray(t_all)
        for lo in range(0, E, B):
            hi = min(lo + B, E)
            rows = np.arange(lo, hi)
            # negatives drawn from the same small universe → frequent
            # collisions with endpoints in the same block
            neg = r.integers(0, N, hi - lo).astype(np.int32)
            args = (src_all[lo:hi], dst_all[lo:hi], t_all[lo:hi], rows,
                    blocks_all[lo:hi], neg)
            clock_before = np.array(pk_b.clock, np.float32)
            pack = pk_a.pack(*args)
            out = pk_b.pack_wire_dedup(*args)
            assert out is not None
            wire, P = out
            want = pack.device()
            wire = train_lean_dedup(wire, blocks_all[lo:hi], 64,
                                    clock_before)
            assert wire.cache_dt is None and wire.clock0 is not None
            got = expand_dedup(jax.tree.map(jnp.asarray, wire),
                               cfg.num_neighbors, P, N,
                               ev_times=times_dev)
            for f in type(want)._fields:
                a = getattr(want, f)
                b = getattr(got, f)
                if a is None:
                    assert b is None, f
                    continue
                np.testing.assert_array_equal(
                    np.asarray(a),
                    np.asarray(b).astype(np.asarray(a).dtype),
                    err_msg=f"train lean S={S} batch@{lo} field {f}")


def test_train_lean_key_width_guard():
    """train_lean_dedup must refuse (return the wire unchanged) when
    the device order key blk·3B + role·B + row would overflow int32 —
    wrapped keys silently pick the wrong clock write (review r5)."""
    from tgb_tgn_dgl_tpu.data.dependency import dependency_aware_batch
    from tgb_tgn_dgl_tpu.ops.wire import train_lean_dedup

    r = np.random.default_rng(11)
    N, B, E = 60, 150, 150
    cfg = PackerConfig(num_neighbors=5, batch_size=B, max_intra_block=8)
    pk = StreamPacker(N, cfg)
    src = r.integers(0, N, E).astype(np.int32)
    dst = r.integers(0, N, E).astype(np.int32)
    t = np.sort(r.uniform(0, 1e6, E)).astype(np.float32)
    blocks = dependency_aware_batch(src, dst, B)
    snap = pk.clock_snapshot()
    out = pk.pack_wire_dedup(src, dst, t, np.arange(E), blocks,
                             r.integers(0, N, E).astype(np.int32))
    assert out is not None
    wire, _P = out
    # nb_bucket large enough that 3*B*nb_bucket >= 2^31 -> guard fires
    huge = 2 ** 31 // (3 * len(wire.ev_t)) + 1
    lean = train_lean_dedup(wire, blocks, huge, snap)
    assert lean.cache_dt is not None and lean.clock0 is None
    # sane bucket on the SAME wire still goes lean
    lean2 = train_lean_dedup(wire, blocks, 64, snap)
    assert lean2.cache_dt is None and lean2.clock0 is not None


def test_clock_snapshot_is_fresh_copy():
    """clock_snapshot() returns a copy decoupled from the live clock
    (the train-lean pre-batch snapshot must not alias packer state)."""
    cfg = PackerConfig(num_neighbors=5, batch_size=16, max_intra_block=8)
    pk = StreamPacker(40, cfg)
    snap = pk.clock_snapshot()
    np.testing.assert_array_equal(snap, pk.clock)
    pk.clock[3] = 123.0
    assert snap[3] != 123.0
