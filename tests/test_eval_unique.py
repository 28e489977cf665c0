"""Slot-unique eval (engine/train.py::_evaluate_unique) vs the
column-chunk protocol: identical metrics and identical stream state.

The slot-unique mode packs each eval batch once with the full
M-negative matrix (per-block root sets dedup to the unique candidates),
scans the embed over root-slot chunks into one table, and ranks by
gathers — it must be EXACTLY the chunked protocol's result: the same
(node, block) embeddings, the same predictor math, and integer rank
counts that are associative over any column partition.
"""
import numpy as np
import pytest

from tgb_tgn_dgl_tpu.data.dataset import synthetic
from tgb_tgn_dgl_tpu.engine.train import Engine
from tgb_tgn_dgl_tpu.utils.config import parse_config_dict


def _conf(frozen, unique, neg_mode="truncate_min"):
    return parse_config_dict({
        "sampling": [{"neighbor": [5]}],
        "memory": [{"dim_out": 16, "dim_time": 16, "mailbox_size": 2}],
        "gnn": [{"dim_out": 16, "att_head": 2, "dim_time": 16}],
        "train": [{"batch_size": 150, "lr": 1e-3, "dropout": 0.0,
                   "att_dropout": 0.0, "frozen_memory": frozen,
                   "eval_slot_unique": unique, "eval_neg_mode": neg_mode,
                   "seed": 11}],
    })


@pytest.fixture(scope="module")
def ev_data():
    return synthetic("eval-unique", num_edges=1400, num_nodes=120,
                     msg_dim=6, num_neg=7, seed=19)


@pytest.mark.parametrize("frozen", [True, False])
def test_unique_eval_matches_chunked(ev_data, frozen):
    a = Engine(ev_data, _conf(frozen, unique=False))
    b = Engine(ev_data, _conf(frozen, unique=True))
    assert b._eval_unique_supported()
    for eng in (a, b):
        eng.train_epoch()
    va, vb = a.evaluate("val"), b.evaluate("val")
    np.testing.assert_allclose(va, vb, rtol=0, atol=0)
    # stream state advanced identically through eval
    np.testing.assert_array_equal(a.packer.cache_eid, b.packer.cache_eid)
    np.testing.assert_array_equal(a.packer.clock, b.packer.clock)
    np.testing.assert_array_equal(a.packer.mail_ptr, b.packer.mail_ptr)
    # the test split continues from it identically
    ta, tb = a.evaluate("test"), b.evaluate("test")
    np.testing.assert_allclose(ta, tb, rtol=0, atol=0)


@pytest.mark.parametrize("toggles", [(False, False), (True, True)])
def test_unique_eval_dyrep_matches_chunked(ev_data, toggles):
    """DyRep's eager mail computes messages from the batch EMBEDDINGS;
    the slot-unique table holds the same per-(node, block) embeddings
    the chunked protocol's mail-writing chunk used, so the protocols
    must agree exactly — metric AND the eager memory/mail state the
    eval pass leaves behind (the streaming protocol carries it into
    the next split)."""
    src_emb, dst_emb = toggles

    def conf(unique):
        return parse_config_dict({
            "sampling": [{"neighbor": [5]}],
            "memory": [{"dim_out": 16, "dim_time": 16,
                        "memory_update": "rnn",
                        "use_src_emb_in_msg": src_emb,
                        "use_dst_emb_in_msg": dst_emb}],
            "gnn": [{"arch": "dyrep", "dim_out": 16, "att_head": 2}],
            "train": [{"batch_size": 150, "lr": 1e-3, "dropout": 0.0,
                       "att_dropout": 0.0, "frozen_memory": False,
                       "eval_slot_unique": unique, "seed": 11}],
        })

    a = Engine(ev_data, conf(False))
    b = Engine(ev_data, conf(True))
    assert b.eager_memory and b._eval_unique_supported()
    for eng in (a, b):
        eng.train_epoch()
    va, vb = a.evaluate("val"), b.evaluate("val")
    np.testing.assert_allclose(va, vb, rtol=0, atol=0)
    import jax
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-6, atol=1e-7),
        a.mem_state, b.mem_state)
    # the test split streams on from that state identically
    np.testing.assert_allclose(a.evaluate("test"), b.evaluate("test"),
                               rtol=0, atol=0)


def test_unique_eval_pad_mask_mode(ev_data):
    a = Engine(ev_data, _conf(True, unique=False, neg_mode="pad_mask"))
    b = Engine(ev_data, _conf(True, unique=True, neg_mode="pad_mask"))
    a.train_epoch()
    b.train_epoch()
    np.testing.assert_allclose(a.evaluate("val"), b.evaluate("val"),
                               rtol=0, atol=0)


def test_unique_eval_small_chunks_exercise_scan(ev_data):
    """Force multiple embed chunks by shrinking the per-chunk budget —
    the scan + dynamic_update_slice path must agree with one chunk."""
    import tgb_tgn_dgl_tpu.engine.train as T

    b = Engine(ev_data, _conf(True, unique=True))
    b.train_epoch()
    want = b.evaluate("val")

    c = Engine(ev_data, _conf(True, unique=True))
    c.train_epoch()
    src = T.Engine._eval_unique_batches
    # monkeypatch the chunk budget: 49152 -> 256 root slots
    import types

    def patched(self, split, fixed, B, nb_bucket):
        for item in src(self, split, fixed, B, nb_bucket):
            yield item

    # easier: patch via generator rewrapping is a no-op; instead patch
    # the constant by re-preparing wires with a tiny budget
    orig = T.Engine._eval_unique_batches

    def tiny(self, split, fixed, B, nb_bucket):
        for (lo, hi, M, wire, iw, mask, n_chunks,
             n_mc) in orig(self, split, fixed, B, nb_bucket):
            R = np.asarray(wire.root_loc).shape[0]
            n2 = max(1, R // 256)
            while R % n2:
                n2 -= 1
            yield lo, hi, M, wire, iw, mask, n2, n_mc

    T.Engine._eval_unique_batches = tiny
    try:
        got = c.evaluate("val")
    finally:
        T.Engine._eval_unique_batches = orig
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def _hub_data(M=5, seed=3):
    """Stream whose val split has >255 dependency blocks in ONE batch:
    a hub node is an endpoint of ~350 of the 600 val events, so the
    leveler (data/dependency.py) chains them into ~350 sequential
    blocks — the case the u8 block-id field used to bail on
    (VERDICT r4 weak-5)."""
    from tgb_tgn_dgl_tpu.data.dataset import (TemporalData,
                                              chronological_masks)
    rng = np.random.default_rng(seed)
    E, N = 1800, 80
    src = rng.integers(1, N // 2, size=E).astype(np.int32)
    dst = rng.integers(N // 2, N, size=E).astype(np.int32)
    # hub: node 0 is src of 350 of the middle (val) 600 events
    hub_rows = 600 + rng.choice(600, size=350, replace=False)
    src[hub_rows] = 0
    t = np.cumsum(rng.exponential(1.0, size=E)).astype(np.float32)
    msg = rng.normal(0, 1, size=(E, 4)).astype(np.float32)
    tr, va, te = chronological_masks(E, val_ratio=1 / 3, test_ratio=1 / 3)
    uni = np.unique(dst)

    def ns_for(mask):
        pos = dst[mask]
        ns = rng.choice(uni, size=(int(mask.sum()), M)).astype(np.int32)
        for _ in range(4):
            bad = ns == pos[:, None]
            ns[bad] = rng.choice(uni, size=int(bad.sum()))
        return ns

    return TemporalData(name="hub-blocks", src=src, dst=dst, t=t,
                        msg=msg, train_mask=tr, val_mask=va,
                        test_mask=te, val_ns=ns_for(va),
                        test_ns=ns_for(te))


def test_unique_eval_over_255_blocks():
    """>255 dependency blocks must take the slot-unique path (u16 block
    ids) and agree exactly with the chunked protocol."""
    data = _hub_data()
    cfg_u = _conf(True, unique=True)
    cfg_c = _conf(True, unique=False)
    for c in (cfg_u, cfg_c):
        c.train.batch_size = 600
    b = Engine(data, cfg_u)
    blocks = b.blocks_for("val")
    assert int(blocks.max()) + 1 > 255, "fixture must exceed 255 blocks"
    active, nb_bucket = b._eval_unique_active("val", data.val_ns, 600)
    assert active and nb_bucket > 256         # the u16 regime
    a = Engine(data, cfg_c)
    for eng in (a, b):
        eng.train_epoch()
    np.testing.assert_allclose(a.evaluate("val"), b.evaluate("val"),
                               rtol=0, atol=0)


def test_gate_log_names_reason(capsys):
    """A closed gate logs WHICH gate closed (once), instead of silently
    falling back 4-10x slower (VERDICT r4 weak-5)."""
    data = synthetic("gate-log", num_edges=1200, num_nodes=100,
                     msg_dim=4, num_neg=5, seed=7)
    cfg = _conf(True, unique=True)
    cfg.train.max_intra_block = None         # the ADVICE r4 medium hole
    e = Engine(data, cfg)
    active, _ = e._eval_unique_active("val", data.val_ns, 150)
    assert not active
    out = capsys.readouterr().out
    assert "slot-unique protocol off" in out
    assert "max_intra_block" in out
    # once per (run, reason)
    e._eval_unique_active("val", data.val_ns, 150)
    assert "slot-unique" not in capsys.readouterr().out


def test_auto_gate_scales():
    """The 'auto' gate: slot-unique on small-N (real per-block dedup),
    column chunks on large-N (candidates ~unique per block), and loud
    rejection of invalid knob values."""
    cfg = parse_config_dict({
        "sampling": [{"neighbor": [5]}],
        "gnn": [{"dim_out": 16, "att_head": 2, "dim_time": 16}],
        "train": [{"batch_size": 500, "frozen_memory": True}],
    })
    small = synthetic("gate-s", num_edges=4000, num_nodes=300, msg_dim=4,
                      num_neg=99, seed=5)
    e1 = Engine(small, cfg)
    active, nb = e1._eval_unique_active("val", small.val_ns, 500)
    assert active and nb >= 16

    big = synthetic("gate-b", num_edges=4000, num_nodes=60000, msg_dim=4,
                    num_neg=20, seed=5)
    e2 = Engine(big, cfg)
    active, _ = e2._eval_unique_active("val", big.val_ns, 500)
    assert not active

    with pytest.raises(ValueError, match="eval_slot_unique"):
        parse_config_dict({
            "train": [{"eval_slot_unique": "true"}],
        }).validate()
