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
