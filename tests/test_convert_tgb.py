"""Fixture test for tools/convert_tgb.py (VERDICT r3 item 7).

The converter can never see the real ``tgb`` package in this zero-egress
environment, so these tests inject a stub module mimicking the exact
object surface the converter consumes (reference utils.py:25-67,
epoch_utils.py:43): ``PyGLinkPropPredDataset`` → ``get_TemporalData()``
torch tensors, chronological ``train/val/test_mask``, lazily-loaded
``negative_sampler.query_batch`` per-event negative lists (rectangular
AND ragged), and ``eval_metric``.  The emitted npz must round-trip
through ``data.dataset.load_npz`` into a trainable ``Engine``.
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tgb_tgn_dgl_tpu.data.dataset import load_npz, synthetic


class _FakeTemporalData:
    def __init__(self, src, dst, t, msg):
        self.src = torch.as_tensor(src)
        self.dst = torch.as_tensor(dst)
        self.t = torch.as_tensor(t)
        self.msg = torch.as_tensor(msg)


class _FakeNegSampler:
    """query_batch(src, dst, t, split_mode) -> list of per-event negative
    id lists — the ragged-return contract of tgb's sampler the reference
    consumes at epoch_utils.py:43."""

    def __init__(self, ns_by_split):
        self.ns_by_split = ns_by_split
        self.loaded = set()

    def query_batch(self, src, dst, t, split_mode):
        assert split_mode in self.loaded, (
            f"query_batch before load_{split_mode}_ns()")
        lists = self.ns_by_split[split_mode]
        assert len(lists) == len(src)
        return [np.asarray(l) for l in lists]


class _FakeDataset:
    eval_metric = "mrr"

    def __init__(self, name, root):
        # deterministic synthetic stream reused as ground truth
        base = synthetic("convert-fix", num_edges=400, num_nodes=60,
                         msg_dim=5, num_neg=3, seed=11)
        self._base = base
        self._td = _FakeTemporalData(
            base.src.astype(np.int64), base.dst.astype(np.int64),
            base.t.astype(np.float64), base.msg)
        self.train_mask = torch.as_tensor(base.train_mask)
        self.val_mask = torch.as_tensor(base.val_mask)
        self.test_mask = torch.as_tensor(base.test_mask)
        ns = {"val": self._make_ns(base, "val"),
              "test": self._make_ns(base, "test")}
        self.negative_sampler = _FakeNegSampler(ns)

    def _make_ns(self, base, split):
        raise NotImplementedError

    def get_TemporalData(self):
        return self._td

    def load_val_ns(self):
        self.negative_sampler.loaded.add("val")

    def load_test_ns(self):
        self.negative_sampler.loaded.add("test")


class _RectDataset(_FakeDataset):
    def _make_ns(self, base, split):
        ns = base.val_ns if split == "val" else base.test_ns
        return [row for row in np.asarray(ns)]


class _RaggedDataset(_FakeDataset):
    eval_metric = "hits@10"

    def _make_ns(self, base, split):
        ns = np.asarray(base.val_ns if split == "val" else base.test_ns)
        rng = np.random.default_rng(7 if split == "val" else 8)
        out = []
        for i, row in enumerate(ns):
            m = int(rng.integers(1, ns.shape[1] + 1))
            out.append(row[:m])
        return out


class _ReviewRaggedDataset(_FakeDataset):
    """tgbl-review-shaped rehearsal: hits@k metric + WIDELY ragged
    per-event negative lists (1..M draws from the destination universe,
    like tgb's pre-generated review negatives) — the shape profile the
    first real run will see (reference epoch_utils.py:43-56)."""

    eval_metric = "hits@10"

    def __init__(self, name, root):
        base = synthetic("convert-review", num_edges=900, num_nodes=140,
                         msg_dim=5, num_neg=2, seed=23)
        self._base = base
        self._td = _FakeTemporalData(
            base.src.astype(np.int64), base.dst.astype(np.int64),
            base.t.astype(np.float64), base.msg)
        self.train_mask = torch.as_tensor(base.train_mask)
        self.val_mask = torch.as_tensor(base.val_mask)
        self.test_mask = torch.as_tensor(base.test_mask)
        ns = {"val": self._make_ns(base, "val"),
              "test": self._make_ns(base, "test")}
        self.negative_sampler = _FakeNegSampler(ns)

    def _make_ns(self, base, split):
        mask = base.val_mask if split == "val" else base.test_mask
        pos = base.dst[mask]
        uni = np.unique(base.dst)
        rng = np.random.default_rng(17 if split == "val" else 18)
        out = []
        for p in pos:
            m = int(rng.integers(1, 51))       # review-scale raggedness
            row = rng.choice(uni, size=m)
            row[row == p] = uni[0] if uni[0] != p else uni[1]
            out.append(row.astype(np.int64))
        return out


def _install_stub(monkeypatch, dataset_cls):
    tgb = types.ModuleType("tgb")
    link = types.ModuleType("tgb.linkproppred")
    dpyg = types.ModuleType("tgb.linkproppred.dataset_pyg")
    dpyg.PyGLinkPropPredDataset = dataset_cls
    tgb.linkproppred = link
    link.dataset_pyg = dpyg
    monkeypatch.setitem(sys.modules, "tgb", tgb)
    monkeypatch.setitem(sys.modules, "tgb.linkproppred", link)
    monkeypatch.setitem(sys.modules, "tgb.linkproppred.dataset_pyg", dpyg)


def test_convert_rectangular_roundtrip(tmp_path, monkeypatch):
    _install_stub(monkeypatch, _RectDataset)
    sys.path.insert(0, ".")
    from tools.convert_tgb import convert

    out = str(tmp_path / "wiki.npz")
    convert("tgbl-fake", str(tmp_path), out)
    got = load_npz(out, name="tgbl-fake")
    want = _RectDataset("tgbl-fake", str(tmp_path))._base

    np.testing.assert_array_equal(got.src, want.src)
    np.testing.assert_array_equal(got.dst, want.dst)
    np.testing.assert_allclose(got.t, want.t)
    np.testing.assert_allclose(got.msg, want.msg)
    np.testing.assert_array_equal(got.train_mask, want.train_mask)
    np.testing.assert_array_equal(got.val_mask, want.val_mask)
    np.testing.assert_array_equal(got.test_mask, want.test_mask)
    assert got.val_ns.dtype != object           # rectangular stays dense
    np.testing.assert_array_equal(got.val_ns, np.asarray(want.val_ns))
    np.testing.assert_array_equal(got.test_ns, np.asarray(want.test_ns))
    assert got.eval_metric == "mrr"

    # the converted npz feeds the Engine unmodified
    from tgb_tgn_dgl_tpu.engine.train import Engine
    from tgb_tgn_dgl_tpu.utils.config import parse_config_dict

    config = parse_config_dict({
        "sampling": [{"neighbor": [4]}],
        "gnn": [{"dim_out": 8, "att_head": 2}],
        "train": [{"batch_size": 100, "epoch": 1}],
    })
    engine = Engine(got, config)
    stats = engine.train_epoch()
    assert np.isfinite(stats["loss"])
    v = engine.evaluate("val")
    assert 0.0 < v <= 1.0


def test_convert_ragged_pad_mask_roundtrip(tmp_path, monkeypatch):
    """Ragged negative lists save as object arrays; load_npz recovers
    them, the engine's pad_mask mode consumes them, and the declared
    hits@k metric survives the round trip."""
    _install_stub(monkeypatch, _RaggedDataset)
    sys.path.insert(0, ".")
    from tools.convert_tgb import convert

    out = str(tmp_path / "ragged.npz")
    convert("tgbl-fake-ragged", str(tmp_path), out)
    got = load_npz(out, name="tgbl-fake-ragged")
    assert got.val_ns.dtype == object
    want = _RaggedDataset("x", str(tmp_path))
    want_lists = want.negative_sampler.ns_by_split["val"]
    assert len(got.val_ns) == len(want_lists)
    for a, b in zip(got.val_ns, want_lists):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert got.eval_metric == "hits@10"

    from tgb_tgn_dgl_tpu.engine.train import Engine
    from tgb_tgn_dgl_tpu.utils.config import parse_config_dict

    config = parse_config_dict({
        "sampling": [{"neighbor": [4]}],
        "gnn": [{"dim_out": 8, "att_head": 2}],
        "train": [{"batch_size": 100, "epoch": 1,
                   "eval_neg_mode": "pad_mask"}],
    })
    engine = Engine(got, config)
    engine.train_epoch()
    v = engine.evaluate("val")
    assert 0.0 <= v <= 1.0


@pytest.mark.parametrize("dataset_cls,metric,neg_mode", [
    (_RectDataset, "mrr", "truncate_min"),
    (_ReviewRaggedDataset, "hits@10", "pad_mask"),
])
def test_convert_full_fit_eval_roundtrip(tmp_path, monkeypatch,
                                         dataset_cls, metric, neg_mode):
    """The FULL first-real-run rehearsal (VERDICT r4 item 7):
    tools/convert_tgb.py → npz → Engine.fit (real mailbox memory,
    per-epoch val) → test eval continuing the stream — the val→test
    memory/state-carry protocol (reference pyg-mem-tgn.py:54-63 runs
    val each epoch and test streams on from val state; SURVEY.md §5.4).
    Covers both metric surfaces (mrr rectangular, hits@k with
    review-scale ragged negatives)."""
    _install_stub(monkeypatch, dataset_cls)
    sys.path.insert(0, ".")
    from tools.convert_tgb import convert

    out = str(tmp_path / "full.npz")
    convert("tgbl-full", str(tmp_path), out)
    got = load_npz(out, name="tgbl-full")
    assert got.eval_metric == metric

    from tgb_tgn_dgl_tpu.engine.train import Engine
    from tgb_tgn_dgl_tpu.utils.config import parse_config_dict

    config = parse_config_dict({
        "sampling": [{"neighbor": [4]}],
        "memory": [{"dim_out": 8, "dim_time": 8}],
        "gnn": [{"dim_out": 8, "att_head": 2}],
        "train": [{"batch_size": 100, "lr": 1e-3,
                   "frozen_memory": False,
                   "eval_neg_mode": neg_mode}],
    })
    engine = Engine(got, config)
    hist = engine.fit(epochs=2, log=lambda *a, **k: None, eval_every=1)
    assert len(hist["loss"]) == 2 and len(hist["val"]) == 2
    assert all(np.isfinite(v) for v in hist["loss"])
    assert all(0.0 < v <= 1.0 for v in hist["val"])
    # real mailbox memory moved through the fit
    assert np.abs(np.asarray(engine.mem_state.mem)).sum() > 0
    # val→test carry: the last epoch's val pass streamed the state
    # cursor through train+val; test continues to the stream end
    n_tr = int(got.train_mask.sum())
    n_va = int(got.val_mask.sum())
    assert engine.packer.cur_e_id == n_tr + n_va
    v_test = engine.evaluate("test")
    assert 0.0 < v_test <= 1.0
    assert engine.packer.cur_e_id == got.num_edges
