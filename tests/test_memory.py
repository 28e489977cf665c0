"""Tests for the functional TGN mailbox memory (models/memory.py).

Strategy (SURVEY.md §4): kernel-level parity with torch's cells, an
event-by-event numpy oracle for the mailbox state machine, and an
engine-level smoke test with memory enabled.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tgb_tgn_dgl_tpu.data.dataset import synthetic
from tgb_tgn_dgl_tpu.data.dependency import get_block
from tgb_tgn_dgl_tpu.data.packer import PackerConfig, StreamPacker
from tgb_tgn_dgl_tpu.models.memory import (MemoryModelConfig, apply_mail,
                                           commit, init_memory_params,
                                           init_memory_state)
from tgb_tgn_dgl_tpu.ops.recurrent import (gru_cell, init_gru_cell,
                                           init_rnn_cell, rnn_cell)


def test_gru_cell_matches_torch():
    torch = pytest.importorskip("torch")
    key = jax.random.PRNGKey(0)
    p = init_gru_cell(key, 12, 8)
    cell = torch.nn.GRUCell(12, 8)
    with torch.no_grad():
        cell.weight_ih.copy_(torch.from_numpy(np.asarray(p["w_ih"]).T))
        cell.weight_hh.copy_(torch.from_numpy(np.asarray(p["w_hh"]).T))
        cell.bias_ih.copy_(torch.from_numpy(np.asarray(p["b_ih"])))
        cell.bias_hh.copy_(torch.from_numpy(np.asarray(p["b_hh"])))
    rng = np.random.default_rng(1)
    x = rng.normal(size=(5, 12)).astype(np.float32)
    h = rng.normal(size=(5, 8)).astype(np.float32)
    ours = np.asarray(gru_cell(p, jnp.asarray(x), jnp.asarray(h)))
    theirs = cell(torch.from_numpy(x), torch.from_numpy(h)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_rnn_cell_matches_torch():
    torch = pytest.importorskip("torch")
    p = init_rnn_cell(jax.random.PRNGKey(0), 6, 4)
    cell = torch.nn.RNNCell(6, 4)
    with torch.no_grad():
        cell.weight_ih.copy_(torch.from_numpy(np.asarray(p["w_ih"]).T))
        cell.weight_hh.copy_(torch.from_numpy(np.asarray(p["w_hh"]).T))
        cell.bias_ih.copy_(torch.from_numpy(np.asarray(p["b_ih"])))
        cell.bias_hh.copy_(torch.from_numpy(np.asarray(p["b_hh"])))
    rng = np.random.default_rng(2)
    x = rng.normal(size=(3, 6)).astype(np.float32)
    h = rng.normal(size=(3, 4)).astype(np.float32)
    ours = np.asarray(rnn_cell(p, jnp.asarray(x), jnp.asarray(h)))
    theirs = cell(torch.from_numpy(x), torch.from_numpy(h)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


class OracleMemory:
    """Event-by-event numpy oracle of the reference memory semantics:
    per-node last-message store, lazy apply-at-read with the current
    memory (reference modules/memory_module.py:116-124,193-207), GRU
    update, last_update = message time."""

    def __init__(self, params, cfg: MemoryModelConfig, feats):
        self.p = params
        self.cfg = cfg
        self.feats = np.asarray(feats)
        self.mem = np.zeros((cfg.num_nodes, cfg.memory_dim), np.float32)
        self.lu = np.zeros(cfg.num_nodes, np.float32)
        self.store = {}   # node -> list[(partner, t, eid)] capped at S

    def read(self, nodes):
        """Apply pending mail for `nodes`, return memory rows.  Messages
        are computed from the pre-read memory snapshot (the device path
        applies all nodes simultaneously)."""
        base = self.mem.copy()
        base_lu = self.lu.copy()
        for n in nodes:
            mails = self.store.pop(int(n), None)
            if not mails:
                continue
            if self.cfg.combine == "last":
                mails = [max(mails, key=lambda m: m[2])]
            msgs = []
            for partner, t, eid in mails:
                dt = t - base_lu[n]
                te = np.cos(dt * np.asarray(self.p["time"]["w"])
                            + np.asarray(self.p["time"]["b"]))
                msgs.append(np.concatenate([
                    base[n], base[partner], self.feats[eid], te]))
            agg = np.mean(msgs, axis=0).astype(np.float32)
            h = jnp.asarray(base[n][None])
            upd = gru_cell(self.p["cell"], jnp.asarray(agg[None]), h)
            self.mem[n] = np.asarray(upd)[0]
            self.lu[n] = max(t for _, t, _ in mails)
        return self.mem[np.asarray(nodes)]

    def write(self, src, dst, t, eid):
        s = self.cfg.mailbox_size
        for a, b, tt, e in zip(src, dst, t, eid):
            for node, partner in ((int(a), int(b)), (int(b), int(a))):
                lst = self.store.setdefault(node, [])
                lst.append((partner, float(tt), int(e)))
                del lst[:-s]


@pytest.mark.parametrize("mailbox_size,combine", [(1, "last"), (2, "mean")])
def test_memory_matches_oracle(mailbox_size, combine):
    """Run a random event stream through apply_mail/commit with each
    batch's full read set, compare memory/last_update to the oracle."""
    rng = np.random.default_rng(3)
    N, F, D, T = 12, 4, 8, 6
    cfg = MemoryModelConfig(num_nodes=N, raw_msg_dim=F, memory_dim=D,
                            time_dim=D, mailbox_size=mailbox_size,
                            combine=combine)
    params = init_memory_params(jax.random.PRNGKey(0), cfg)
    feats = rng.normal(size=(50, F)).astype(np.float32)
    state = init_memory_state(cfg)
    oracle = OracleMemory(params, cfg, feats)

    eid = 0
    mail_ptr = np.zeros(N, np.int64)
    for step in range(6):
        b = int(rng.integers(2, 5))
        src = rng.integers(0, N, b).astype(np.int32)
        dst = rng.integers(0, N, b).astype(np.int32)
        t = np.sort(rng.random(b).astype(np.float32)) + step
        eids = np.arange(eid, eid + b, dtype=np.int32)
        eid += b
        # read set: endpoints + a couple of random extra nodes
        extra = rng.integers(0, N, 2).astype(np.int32)
        uniq = np.unique(np.concatenate([src, dst, extra]))

        # device path
        U = len(uniq)
        uniq_pad = np.full(U + 3, N, np.int32)
        uniq_pad[:U] = uniq
        mem_rows, lu_rows = apply_mail(params, cfg, state,
                                       jnp.asarray(uniq_pad),
                                       jnp.asarray(feats))
        # write plan: per node keep last S writes, ring slots
        wnode, wpart, wt, weid, slots = [], [], [], [], []
        order = {}
        for i in range(b):
            for node, partner in ((src[i], dst[i]), (dst[i], src[i])):
                order.setdefault(int(node), []).append(
                    (int(partner), float(t[i]), int(eids[i])))
        S = cfg.mailbox_size
        for node, lst in order.items():
            kept = lst[-S:]
            ptr = mail_ptr[node]
            for j, (partner, tt, e) in enumerate(kept):
                wnode.append(node)
                wpart.append(partner)
                wt.append(tt)
                weid.append(e)
                slots.append(int((ptr + j) % S))
            mail_ptr[node] = (ptr + len(kept)) % S
        state = commit(cfg, state, jnp.asarray(uniq_pad), mem_rows, lu_rows,
                       jnp.asarray(np.asarray(wnode, np.int32)),
                       jnp.asarray(np.asarray(slots, np.int32)),
                       jnp.asarray(np.asarray(wpart, np.int32)),
                       jnp.asarray(np.asarray(wt, np.float32)),
                       jnp.asarray(np.asarray(weid, np.int32)))

        # oracle path
        oracle.read(uniq)
        oracle.write(src, dst, t, eids)

        np.testing.assert_allclose(np.asarray(state.mem)[:N], oracle.mem,
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"step {step}")
        np.testing.assert_allclose(np.asarray(state.last_update)[:N],
                                   oracle.lu, rtol=1e-5, atol=1e-6)


def test_packer_write_plan_unique_and_last_s():
    """The host write plan must emit unique (node, slot) pairs covering
    each node's last-S event-directions of the batch."""
    data = synthetic("tgbl-wiki-small", num_edges=600, num_nodes=40,
                     msg_dim=4, num_neg=4)
    for S in (1, 3):
        packer = StreamPacker(data.num_nodes, PackerConfig(
            num_neighbors=5, batch_size=200, mailbox_size=S))
        for lo in range(0, 600, 200):
            rows = np.arange(lo, lo + 200)
            src, dst, t = data.src[rows], data.dst[rows], data.t[rows]
            blocks = get_block(src, dst)
            neg = np.random.default_rng(0).choice(
                data.unique_dst(), 200).astype(np.int32)
            pack = packer.pack(src, dst, t, rows, blocks, neg)
            valid = pack.mw_node != data.num_nodes
            pairs = (pack.mw_node[valid].astype(np.int64) * S
                     + pack.mw_slot[valid])
            assert len(np.unique(pairs)) == valid.sum(), "slot collision"
            # per-node kept count == min(appearances, S)
            nodes, counts = np.unique(
                np.concatenate([src, dst]), return_counts=True)
            kept = {int(n): 0 for n in nodes}
            for n in pack.mw_node[valid]:
                kept[int(n)] += 1
            for n, c in zip(nodes, counts):
                assert kept[int(n)] == min(int(c), S)
            assert pack.mw_slot[valid].max(initial=0) < S


def test_packer_uniq_and_loc_maps():
    data = synthetic("tgbl-wiki-small", num_edges=400, num_nodes=60,
                     msg_dim=4, num_neg=4)
    packer = StreamPacker(data.num_nodes, PackerConfig(
        num_neighbors=5, batch_size=200))
    rng = np.random.default_rng(0)
    for lo in range(0, 400, 200):
        rows = np.arange(lo, lo + 200)
        src, dst, t = data.src[rows], data.dst[rows], data.t[rows]
        blocks = get_block(src, dst)
        neg = rng.choice(data.unique_dst(), 200).astype(np.int32)
        pack = packer.pack(src, dst, t, rows, blocks, neg)
        uniq = pack.uniq_nid
        # every valid root resolves through root_loc
        rv = pack.root_valid
        np.testing.assert_array_equal(uniq[pack.root_loc[rv]],
                                      pack.root_nid[rv])
        # every valid neighbor resolves through nbr_loc
        ok = pack.nbr_kind != 0
        np.testing.assert_array_equal(uniq[pack.nbr_loc[ok]],
                                      pack.nbr_nid[ok])
        # padded uniq entries are the trash row
        n_real = (uniq != data.num_nodes).sum()
        assert (uniq[n_real:] == data.num_nodes).all()


def test_engine_memory_smoke():
    """Engine with real memory: loss finite and decreasing-ish, eval runs,
    memory state actually changes."""
    from tgb_tgn_dgl_tpu.engine.train import Engine
    from tgb_tgn_dgl_tpu.utils.config import parse_config_dict

    data = synthetic("tgbl-wiki-small", num_edges=2000, num_nodes=150,
                     msg_dim=8, num_neg=8)
    config = parse_config_dict({
        "sampling": [{"neighbor": [5]}],
        "memory": [{"dim_out": 16, "dim_time": 16}],
        "gnn": [{"dim_out": 16, "att_head": 2}],
        "train": [{"batch_size": 256, "lr": 1e-3,
                   "frozen_memory": False}],
    })
    engine = Engine(data, config)
    assert engine.use_memory
    stats = engine.train_epoch()
    assert np.isfinite(stats["loss"])
    mem0 = np.asarray(engine.mem_state.mem)
    assert np.abs(mem0).sum() > 0, "memory never updated"
    mrr1 = engine.evaluate("val")
    assert 0.0 < mrr1 <= 1.0
    stats2 = engine.train_epoch()
    assert np.isfinite(stats2["loss"])
