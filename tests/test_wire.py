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
