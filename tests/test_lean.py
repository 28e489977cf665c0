"""Device-cache mode (ops/lean_wire.py + data/lean_packer.py) parity:
the lean event-only wire expanded against the DEVICE-resident stream
state must reproduce the host packer's grids bit-for-bit, and the lean
engine must train/eval identically to the host-pack engine."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tgb_tgn_dgl_tpu.data.dataset import synthetic
from tgb_tgn_dgl_tpu.data.dependency import get_block
from tgb_tgn_dgl_tpu.data.lean_packer import LeanPacker
from tgb_tgn_dgl_tpu.data.packer import PackerConfig, StreamPacker
from tgb_tgn_dgl_tpu.ops.lean_wire import (advance_stream, expand_lean,
                                           init_stream_device_state,
                                           reset_stream_cache)

# DevicePack fields that must match exactly (uniq/loc tables differ by
# design: lean mode uses a duplicated [roots ⊕ cache-cells] read set)
COMPARE = ["ev_src", "ev_dst", "ev_t", "ev_idx", "ev_valid", "ev_neg",
           "root_nid", "root_valid", "nbr_nid", "nbr_dt", "nbr_kind",
           "nbr_feat", "ev_src_slot", "ev_pos_slot", "ev_neg_slot",
           "mw_node", "mw_slot", "mw_partner", "mw_t", "mw_eid"]


def test_lean_expand_matches_host_pack():
    data = synthetic("lean-parity", num_edges=900, num_nodes=70,
                     msg_dim=5, num_neg=3, seed=13)
    K, B = 4, 128
    cfg = PackerConfig(num_neighbors=K, batch_size=B, max_intra_block=8)
    host = StreamPacker(data.num_nodes, cfg)
    lean = LeanPacker(data.num_nodes, cfg)
    sstate = init_stream_device_state(data.num_nodes, K)
    rng = np.random.default_rng(5)
    for bi in range(6):
        rows = np.arange(bi * B, (bi + 1) * B)
        src, dst, t = data.src[rows], data.dst[rows], data.t[rows]
        blocks = get_block(src, dst)
        em = bi == 4
        neg = (rng.choice(data.unique_dst(), (B, 3)).astype(np.int32)
               if em else
               rng.choice(data.unique_dst(), B).astype(np.int32))
        want = host.pack(src, dst, t, rows, blocks, neg,
                         eval_mode=em).device()
        wire, iw = lean.pack_wire(src, dst, t, rows, blocks, neg,
                                  eval_mode=em)
        got, _nid = expand_lean(wire, sstate, K, iw, data.num_nodes,
                                eval_mode=em, batch_size=B)
        for f in COMPARE:
            np.testing.assert_array_equal(
                np.asarray(getattr(want, f)), np.asarray(getattr(got, f)),
                err_msg=f"batch {bi} field {f}")
        sstate = advance_stream(sstate, wire, data.num_nodes,
                                eval_mode=em)
        # device stream state == host packer state, bit for bit
        np.testing.assert_array_equal(
            np.asarray(sstate.cache.neighbors)[:-1], host.cache_nbr,
            err_msg=f"batch {bi} cache_nbr")
        np.testing.assert_array_equal(
            np.asarray(sstate.cache.e_id)[:-1],
            host.cache_eid.astype(np.int32), err_msg=f"batch {bi} eid")
        np.testing.assert_array_equal(
            np.asarray(sstate.cache.t)[:-1], host.cache_t,
            err_msg=f"batch {bi} cache_t")
        np.testing.assert_array_equal(
            np.asarray(sstate.clock)[:-1], host.clock,
            err_msg=f"batch {bi} clock")


def test_lean_epoch_reset_matches():
    """reset: cache wiped, clocks persist (reference epoch_utils.py:175)."""
    data = synthetic("lean-reset", num_edges=300, num_nodes=40,
                     msg_dim=4, num_neg=2, seed=3)
    K, B = 3, 64
    cfg = PackerConfig(num_neighbors=K, batch_size=B, max_intra_block=4)
    host = StreamPacker(data.num_nodes, cfg)
    lean = LeanPacker(data.num_nodes, cfg)
    sstate = init_stream_device_state(data.num_nodes, K)
    rng = np.random.default_rng(1)
    rows = np.arange(B)
    src, dst, t = data.src[rows], data.dst[rows], data.t[rows]
    blocks = get_block(src, dst)
    neg = rng.choice(data.unique_dst(), B).astype(np.int32)
    host.pack(src, dst, t, rows, blocks, neg)
    wire, _ = lean.pack_wire(src, dst, t, rows, blocks, neg)
    sstate = advance_stream(sstate, wire, data.num_nodes, eval_mode=False)
    host.reset_cache()
    lean.reset_cache()
    sstate = reset_stream_cache(sstate)
    np.testing.assert_array_equal(np.asarray(sstate.cache.e_id)[:-1],
                                  host.cache_eid.astype(np.int32))
    np.testing.assert_array_equal(np.asarray(sstate.clock)[:-1],
                                  host.clock)


def _run_engine(data, device_cache, frozen):
    from tgb_tgn_dgl_tpu.engine.train import Engine
    from tgb_tgn_dgl_tpu.utils.config import parse_config_dict

    cfg = parse_config_dict({
        "sampling": [{"neighbor": [5]}],
        "memory": [{"dim_out": 16, "dim_time": 16}],
        "gnn": [{"att_head": 2, "dim_out": 16}],
        "train": [{"epoch": 1, "batch_size": 64, "lr": 1e-3,
                   "dropout": 0.0, "att_dropout": 0.0,
                   "frozen_memory": frozen,
                   "device_cache": device_cache}],
    })
    eng = Engine(data, cfg)
    assert eng.device_cache == device_cache
    s = eng.train_epoch()
    val = eng.evaluate("val")
    return eng, s, val


@pytest.mark.parametrize("frozen", [True, False],
                         ids=["frozen-memory", "mailbox-memory"])
def test_lean_engine_matches_host_engine(frozen):
    """Full engine parity, dropout off: same epoch loss/AP, same val MRR,
    near-identical params (gradient reduction order differs only through
    the duplicated memory read set)."""
    data = synthetic("tiny-lean", num_edges=1200, num_nodes=100,
                     msg_dim=8, num_neg=6, seed=2)
    e1, s1, v1 = _run_engine(data, False, frozen)
    e2, s2, v2 = _run_engine(data, True, frozen)
    assert s1["events"] == s2["events"]
    np.testing.assert_allclose(s1["loss"], s2["loss"], rtol=1e-5)
    np.testing.assert_allclose(s1["ap"], s2["ap"], rtol=1e-4)
    np.testing.assert_allclose(v1, v2, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(e1.params),
                    jax.tree_util.tree_leaves(e2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def test_lean_checkpoint_roundtrip(tmp_path):
    data = synthetic("tiny-lean2", num_edges=600, num_nodes=60,
                     msg_dim=4, num_neg=3, seed=4)
    from tgb_tgn_dgl_tpu.engine.train import Engine
    from tgb_tgn_dgl_tpu.utils.config import parse_config_dict

    cfg = parse_config_dict({
        "sampling": [{"neighbor": [4]}],
        "memory": [{"dim_out": 8, "dim_time": 8}],
        "gnn": [{"att_head": 2, "dim_out": 8}],
        "train": [{"epoch": 1, "batch_size": 64, "lr": 1e-3,
                   "frozen_memory": False, "device_cache": True}],
    })
    e1 = Engine(data, cfg)
    e1.train_epoch()
    path = str(tmp_path / "lean.npz")
    e1.save_checkpoint(path)
    v1 = e1.evaluate("val")

    e2 = Engine(data, cfg)
    e2.load_checkpoint(path)
    v2 = e2.evaluate("val")
    assert v1 == pytest.approx(v2, abs=1e-7)


def test_native_lean_packer_bit_exact():
    """NativeLeanPacker (C++) == LeanPacker (numpy oracle), every field,
    across train + eval batches (incl. a self-loop event for the
    intra-side attribution edge case)."""
    from tgb_tgn_dgl_tpu.data.lean_packer import (NativeLeanPacker,
                                                  make_lean_packer)
    from tgb_tgn_dgl_tpu.data import native_packer as npk

    lib = npk._lib()
    if lib is None or not hasattr(lib, "packer_pack_fill_lean"):
        pytest.skip("native lean packer not built")
    data = synthetic("lean-native", num_edges=900, num_nodes=70,
                     msg_dim=5, num_neg=3, seed=17)
    # force a self-loop + a repeated edge into the stream
    data.src[10] = data.dst[10]
    data.src[11], data.dst[11] = data.src[10], data.src[10]
    K, B = 4, 128
    cfg = PackerConfig(num_neighbors=K, batch_size=B, max_intra_block=8)
    a = LeanPacker(data.num_nodes, cfg)
    b = NativeLeanPacker(data.num_nodes, cfg)
    rng = np.random.default_rng(5)
    for bi in range(6):
        rows = np.arange(bi * B, (bi + 1) * B)
        src, dst, t = data.src[rows], data.dst[rows], data.t[rows]
        blocks = get_block(src, dst)
        em = bi == 4
        neg = (rng.choice(data.unique_dst(), (B, 3)).astype(np.int32)
               if em else
               rng.choice(data.unique_dst(), B).astype(np.int32))
        wa, iwa = a.pack_wire(src, dst, t, rows, blocks, neg,
                              eval_mode=em)
        wb, iwb = b.pack_wire(src, dst, t, rows, blocks, neg,
                              eval_mode=em)
        assert iwa == iwb
        for f in type(wa)._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(wa, f)), np.asarray(getattr(wb, f)),
                err_msg=f"batch {bi} field {f}")
    np.testing.assert_array_equal(a.mail_ptr, b.mail_ptr)
