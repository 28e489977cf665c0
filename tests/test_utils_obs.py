"""Tests for metrics logging and visualization utilities."""
import json
import os

import pytest

import numpy as np

from tgb_tgn_dgl_tpu.data.dataset import synthetic
from tgb_tgn_dgl_tpu.data.dependency import get_block
from tgb_tgn_dgl_tpu.data.packer import PackerConfig, StreamPacker
from tgb_tgn_dgl_tpu.utils.metrics import MetricsLogger, SectionTimers
from tgb_tgn_dgl_tpu.utils.visualize import (pack_to_networkx,
                                             visualize_embeddings,
                                             visualize_pack)


def _make_pack():
    data = synthetic("tgbl-wiki-small", num_edges=200, num_nodes=40,
                     msg_dim=4, num_neg=2)
    packer = StreamPacker(data.num_nodes, PackerConfig(
        num_neighbors=4, batch_size=100))
    rng = np.random.default_rng(0)
    pack = None
    for lo in (0, 100):
        rows = np.arange(lo, lo + 100)
        src, dst, t = data.src[rows], data.dst[rows], data.t[rows]
        neg = rng.choice(data.unique_dst(), 100).astype(np.int32)
        pack = packer.pack(src, dst, t, rows, get_block(src, dst), neg)
    return pack


def test_metrics_logger_jsonl(tmp_path):
    m = MetricsLogger(str(tmp_path))
    m.log("train_epoch", epoch=1, loss=2.5)
    m.log("val", epoch=1, value=0.4)
    m.close()
    lines = open(tmp_path / "metrics.jsonl").read().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[0])
    assert rec["event"] == "train_epoch" and rec["loss"] == 2.5
    assert "wall_s" in rec


def test_section_timers():
    t = SectionTimers()
    for _ in range(3):
        with t.section("pack"):
            sum(range(1000))
    s = t.summary()
    assert s["pack"]["count"] == 3
    assert s["pack"]["total_s"] >= 0


def test_pack_to_networkx():
    pack = _make_pack()
    g = pack_to_networkx(pack, max_roots=20)
    if g is None:  # networkx unavailable
        return
    assert g.number_of_nodes() > 0
    kinds = {d["kind"] for _, _, d in g.edges(data=True)}
    assert kinds <= {"cache", "intra", "self"}
    assert "cache" in kinds or "intra" in kinds


def test_visualize_pack_and_embeddings(tmp_path):
    pack = _make_pack()
    p1 = visualize_pack(pack, path=str(tmp_path / "batch.png"),
                        max_roots=15)
    if p1 is not None:
        assert os.path.exists(p1) and os.path.getsize(p1) > 0
    rng = np.random.default_rng(0)
    p2 = visualize_embeddings(rng.normal(size=(30, 16)),
                              labels=np.arange(30) % 3,
                              path=str(tmp_path / "emb.png"))
    if p2 is not None:
        assert os.path.exists(p2) and os.path.getsize(p2) > 0


def test_engine_fit_writes_metrics(tmp_path):
    from tgb_tgn_dgl_tpu.engine.train import Engine
    from tgb_tgn_dgl_tpu.utils.config import parse_config_dict

    data = synthetic("tgbl-wiki-small", num_edges=800, num_nodes=80,
                     msg_dim=4, num_neg=4)
    config = parse_config_dict({
        "sampling": [{"neighbor": [4]}],
        "gnn": [{"dim_out": 8, "att_head": 2}],
        "train": [{"batch_size": 200}],
    })
    engine = Engine(data, config)
    engine.fit(epochs=1, log_dir=str(tmp_path))
    lines = open(tmp_path / "metrics.jsonl").read().splitlines()
    events = [json.loads(l)["event"] for l in lines]
    assert "train_epoch" in events and "val" in events


def test_device_metrics_match_numpy():
    """jnp_ap_auc / jnp_mrr must match the numpy/sklearn-equivalent
    implementations on continuous scores."""
    import jax.numpy as jnp
    from tgb_tgn_dgl_tpu.engine.evaluator import (average_precision,
                                                  jnp_ap_auc, jnp_mrr, mrr,
                                                  roc_auc)
    rng = np.random.default_rng(0)
    B, M = 200, 7
    pos = rng.normal(size=B).astype(np.float32)
    neg = rng.normal(size=B).astype(np.float32)
    valid = np.ones(B, bool)
    valid[180:] = False
    ap, auc = jnp_ap_auc(jnp.asarray(pos), jnp.asarray(neg),
                         jnp.asarray(valid))
    y_true = np.concatenate([np.ones(180), np.zeros(180)])
    y_score = np.concatenate([pos[:180], neg[:180]])
    assert float(ap) == pytest.approx(average_precision(y_true, y_score),
                                      abs=1e-5)
    assert float(auc) == pytest.approx(roc_auc(y_true, y_score), abs=1e-5)

    negs = rng.normal(size=(B, M)).astype(np.float32)
    rr = jnp_mrr(jnp.asarray(pos), jnp.asarray(negs), jnp.asarray(valid))
    want = mrr(pos[:180], negs[:180])
    np.testing.assert_allclose(np.asarray(rr)[:180], want, rtol=1e-6)
    assert (np.asarray(rr)[180:] == 0).all()


def test_config_schema_only_knobs_raise():
    """Truthful config: non-default values of schema-only knobs (TGL
    sampler fields the reference never implemented either) fail loudly
    instead of being silently ignored (utils/config.py docstring)."""
    import pytest

    from tgb_tgn_dgl_tpu.utils.config import parse_config_dict

    parse_config_dict({}).validate()          # defaults pass
    bad = [
        {"sampling": [{"prop_time": True}]},
        {"sampling": [{"history": 2}]},
        {"sampling": [{"duration": 5.0}]},
        {"memory": [{"deliver_to": "neighbors"}]},
        {"memory": [{"combine_node_feature": False}]},
        {"train": [{"reorder": 16}]},
    ]
    for conf in bad:
        with pytest.raises(NotImplementedError):
            parse_config_dict(conf).validate()
