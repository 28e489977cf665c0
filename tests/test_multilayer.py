"""Multi-layer attention (gnn.layer > 1) — stacked EdgeGATConv over the
same per-block in-edge structure (the reference's commented layer stack,
model_utils.py:669-686): a layer-l source contributes its layer-(l-1)
output iff it has a root slot in the SAME dependency block, else its raw
features pass through (zero-in-degree identity residual,
model_utils.py:567-577,541-546)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tgb_tgn_dgl_tpu.data.dataset import synthetic
from tgb_tgn_dgl_tpu.data.dependency import get_block
from tgb_tgn_dgl_tpu.data.packer import (KIND_CACHE, KIND_INTRA,
                                         KIND_INVALID, KIND_SELF,
                                         PackerConfig, StreamPacker)
from tgb_tgn_dgl_tpu.models.tgnn import TGNNConfig, init_tgnn, tgnn_embed


def test_rslot_emission_hand_case():
    """Hand-checked nbr_rslot: self column = own slot; a cache neighbor
    gets the same-block slot iff it is rooted there; an intra partner
    from an earlier block resolves against the ROW's block roots."""
    N = 10
    packer = StreamPacker(N, PackerConfig(
        num_neighbors=2, batch_size=4, layers=2, root_bucket_lo=8))
    # history: edge 5->0 puts 5 into 0's cache (and 0 into 5's)
    packer.insert(np.array([5], np.int32), np.array([0], np.int32),
                  np.array([1.0], np.float32))
    src = np.array([0, 2, 1], np.int32)
    dst = np.array([1, 3, 2], np.int32)
    t = np.array([2.0, 2.0, 3.0], np.float32)
    blocks = np.array([0, 0, 1])
    neg = np.array([3, 0, 0], np.int32)
    pack = packer.pack(src, dst, t, np.arange(3), blocks, neg)
    rs = pack.nbr_rslot
    assert rs is not None
    K = 2
    # block 0 roots = unique{0,2,1,3,3,0} = [0,1,2,3] at slots 0..3
    # block 1 roots = unique{1,2,0}      = [0,1,2] at slots 4..6
    np.testing.assert_array_equal(pack.root_nid[:7],
                                  [0, 1, 2, 3, 0, 1, 2])
    # self column = own slot on all real rows
    for r in range(7):
        assert rs[r, K] == r
    # row 0 (node 0, block 0): cache neighbor 5 is NOT a block-0 root
    row0 = pack.nbr_kind[0, :K]
    assert (row0 == KIND_CACHE).sum() == 1
    assert rs[0, :K][row0 == KIND_CACHE][0] == -1
    # row 5 (node 1, block 1): intra partner is node 0 (event 0->1 of
    # block 0), and node 0 IS a block-1 root at slot 4
    intra_cols = pack.nbr_kind[5] == KIND_INTRA
    assert intra_cols.sum() == 1
    assert pack.nbr_nid[5][intra_cols][0] == 0
    assert rs[5][intra_cols][0] == 4
    # row 4 (node 0, block 1): cache now STILL pre-batch (5 only)
    row4 = pack.nbr_kind[4, :K]
    assert rs[4, :K][row4 == KIND_CACHE][0] == -1
    # every invalid cell is -1
    assert (rs[pack.nbr_kind == KIND_INVALID] == -1).all()
    # every valid rslot points at a slot of the same node
    ok = rs >= 0
    np.testing.assert_array_equal(pack.root_nid[rs[ok]],
                                  pack.nbr_nid[ok])


def _pack_batch(layers):
    data = synthetic("tiny-ml", num_edges=400, num_nodes=60, msg_dim=6,
                     num_neg=2, seed=7)
    packer = StreamPacker(data.num_nodes, PackerConfig(
        num_neighbors=4, batch_size=100, layers=layers))
    rng = np.random.default_rng(3)
    rows0 = np.arange(100)
    packer.pack(data.src[rows0], data.dst[rows0], data.t[rows0], rows0,
                get_block(data.src[rows0], data.dst[rows0]),
                rng.choice(data.unique_dst(), 100).astype(np.int32))
    rows = np.arange(100, 200)
    src, dst, t = data.src[rows], data.dst[rows], data.t[rows]
    pack = packer.pack(src, dst, t, rows,
                       get_block(src, dst),
                       rng.choice(data.unique_dst(), 100).astype(np.int32))
    return data, pack


def test_two_layer_matches_manual_oracle():
    """L=2 scalar-mode output == hand-computed layer-2 attention over the
    layer-1 embeddings (eval mode, dropout inactive)."""
    data, pack = _pack_batch(layers=2)
    D, H = 8, 2
    cfg2 = TGNNConfig(edge_feat_dim=data.msg_dim, hidden_dim=D,
                      num_heads=H, num_layers=2, feat_drop=0.0,
                      attn_drop=0.0)
    params = init_tgnn(jax.random.PRNGKey(0), cfg2)
    memory = jnp.asarray(
        np.random.default_rng(0).normal(size=(data.num_nodes, D))
        .astype(np.float32))
    feats = jnp.asarray(data.msg)
    dpack = pack.device()
    rng = jax.random.PRNGKey(9)
    got = np.asarray(tgnn_embed(params, cfg2, memory, feats, dpack,
                                train=False, rng=rng))
    # layer-1 output via the same code at num_layers=1
    h1 = np.asarray(tgnn_embed(params, cfg2._replace(num_layers=1),
                               memory, feats, dpack, train=False, rng=rng))

    # ---- manual layer 2 (numpy, straight from the formulas) ----------
    gat = jax.tree.map(np.asarray, params["gat2"])
    mask = pack.nbr_kind != KIND_INVALID
    ef = np.asarray(feats)[np.clip(pack.nbr_feat, 0, len(data.msg) - 1)]
    ef = np.where((pack.nbr_kind == KIND_SELF)[..., None],
                  np.ones_like(ef), ef)
    ef = np.where(mask[..., None], ef, 0.0)
    tw = np.asarray(params["time"]["w"])
    tb = np.asarray(params["time"]["b"])
    te = np.cos(pack.nbr_dt[..., None] * tw + tb)
    e_in = np.concatenate([ef, te], axis=-1)
    rs = pack.nbr_rslot
    src2 = np.where((rs >= 0)[..., None], h1[np.maximum(rs, 0)],
                    np.asarray(memory)[pack.nbr_nid])
    dst2 = h1

    def proj(lin, attn):
        w = lin["w"].reshape(lin["w"].shape[0], H, D)
        w_eff = np.einsum("ihd,hd->ih", w, attn)
        b_eff = np.einsum("hd,hd->h", lin["b"].reshape(H, D), attn)
        return w_eff, b_eff

    wl, bl = proj(gat["fc_node"], gat["attn_l"])
    wr, br = proj(gat["fc_node"], gat["attn_r"])
    we, be = proj(gat["fc_edge"], gat["attn_e"])
    el = src2 @ wl + bl
    er = dst2 @ wr + br
    ee = e_in @ we + be
    elp = el + ee
    logits = np.where(elp + er[:, None, :] >= 0, elp + er[:, None, :],
                      0.2 * (elp + er[:, None, :]))
    logits = np.where(mask[..., None], logits, -1e30)
    ex = np.exp(logits - logits.max(axis=1, keepdims=True))
    ex = np.where(mask[..., None], ex, 0.0)
    a = ex / np.maximum(ex.sum(axis=1, keepdims=True), 1e-30)
    out = (a * elp).sum(axis=1)
    want = dst2 + out.mean(axis=-1, keepdims=True)
    real = np.asarray(pack.root_valid)
    np.testing.assert_allclose(got[real], want[real], rtol=2e-4,
                               atol=2e-4)


def test_two_layer_engine_end_to_end():
    """gnn.layer=2 trains end-to-end (frozen + mailbox memory) and the
    streaming eval protocol runs."""
    from tgb_tgn_dgl_tpu.engine.train import Engine
    from tgb_tgn_dgl_tpu.utils.config import parse_config_dict

    data = synthetic("tiny", num_edges=1200, num_nodes=100, msg_dim=8,
                     num_neg=5, seed=2)
    for frozen in (True, False):
        cfg = parse_config_dict({
            "sampling": [{"neighbor": [5]}],
            "memory": [{"dim_out": 16, "dim_time": 16}],
            "gnn": [{"att_head": 2, "dim_out": 16, "layer": 2}],
            "train": [{"epoch": 2, "batch_size": 64, "lr": 1e-3,
                       "frozen_memory": frozen}],
        })
        eng = Engine(data, cfg)
        assert "gat2" in eng.params
        s1 = eng.train_epoch()
        s2 = eng.train_epoch()
        assert np.isfinite(s1["loss"]) and np.isfinite(s2["loss"])
        assert s2["loss"] < s1["loss"]
        val = eng.evaluate("val")
        assert 0.0 < val <= 1.0


def test_wire_roundtrip_with_rslot():
    """Wire compaction/expansion reproduces nbr_rslot exactly."""
    from tgb_tgn_dgl_tpu.ops.wire import expand_wire, pack_to_wire

    data, pack = _pack_batch(layers=2)
    K = 4
    wire = pack_to_wire(pack, K)
    assert wire.cache_rslot is not None and wire.ia_rslot is not None
    iw = pack.nbr_kind.shape[1] - K - 1
    got = expand_wire(wire, K, iw, data.num_nodes)
    np.testing.assert_array_equal(np.asarray(got.nbr_rslot),
                                  pack.nbr_rslot)


def test_native_packer_rslot_bit_exact():
    """Native (C++) layer-2 wire == numpy layer-2 wire, field by field,
    across a multi-batch stream (numpy is the oracle)."""
    from tgb_tgn_dgl_tpu.data import native_packer as npk

    if not npk.available():
        pytest.skip("libhostops.so not built")
    data = synthetic("tiny-ml2", num_edges=900, num_nodes=70, msg_dim=5,
                     num_neg=3, seed=11)
    cfg = PackerConfig(num_neighbors=3, batch_size=128, layers=2,
                       max_intra_block=8)
    a = StreamPacker(data.num_nodes, cfg)
    b = npk.NativeStreamPacker(data.num_nodes, cfg)
    rng = np.random.default_rng(5)
    for bi in range(6):
        rows = np.arange(bi * 128, (bi + 1) * 128)
        src, dst, t = data.src[rows], data.dst[rows], data.t[rows]
        blocks = get_block(src, dst)
        em = bi == 4
        neg = (rng.choice(data.unique_dst(), (128, 3)).astype(np.int32)
               if em else
               rng.choice(data.unique_dst(), 128).astype(np.int32))
        wa, iwa = a.pack_wire(src, dst, t, rows, blocks, neg, eval_mode=em)
        wb, iwb = b.pack_wire(src, dst, t, rows, blocks, neg, eval_mode=em)
        assert iwa == iwb
        for f in type(wa)._fields:
            va, vb = getattr(wa, f), getattr(wb, f)
            assert (va is None) == (vb is None), f
            if va is not None:
                np.testing.assert_array_equal(
                    np.asarray(va), np.asarray(vb),
                    err_msg=f"batch {bi} field {f}")
