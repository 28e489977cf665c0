"""Tests for the t-CSR module and the 'uniform' sampling strategy."""
import numpy as np

from tgb_tgn_dgl_tpu.data.dataset import synthetic
from tgb_tgn_dgl_tpu.data.tcsr import TCSR, build_tcsr, sample


def test_tcsr_roundtrip_npz(tmp_path):
    data = synthetic("tgbl-wiki-small", num_edges=500, num_nodes=50,
                     msg_dim=2, num_neg=2)
    tc = build_tcsr(data.src, data.dst, data.t, data.num_nodes)
    path = str(tmp_path / "ext_full.npz")
    tc.save_npz(path)
    tc2 = TCSR.load_npz(path)
    np.testing.assert_array_equal(tc.indptr, tc2.indptr)
    np.testing.assert_array_equal(tc.eid, tc2.eid)


def test_sample_strategies_are_causal():
    data = synthetic("tgbl-wiki-small", num_edges=1000, num_nodes=60,
                     msg_dim=2, num_neg=2)
    tc = build_tcsr(data.src, data.dst, data.t, data.num_nodes)
    nodes = np.arange(60, dtype=np.int32)
    times = np.full(60, float(data.t[500]), np.float32)
    for strat in ("recent", "uniform"):
        nbr, eid, ts = sample(tc, nodes, times, 5, strategy=strat, seed=3)
        valid = eid >= 0
        # causality: all sampled edge times strictly before the query
        assert (ts[valid] < times[0]).all(), strat
        # the sampled eid really is an event touching the node
        for q in range(60):
            for j in range(5):
                if eid[q, j] >= 0:
                    e = eid[q, j]
                    assert data.src[e] == q or data.dst[e] == q


def test_engine_uniform_strategy_smoke():
    from tgb_tgn_dgl_tpu.engine.train import Engine
    from tgb_tgn_dgl_tpu.utils.config import parse_config_dict

    data = synthetic("tgbl-wiki-small", num_edges=900, num_nodes=90,
                     msg_dim=4, num_neg=4)
    config = parse_config_dict({
        "sampling": [{"neighbor": [4], "strategy": "uniform"}],
        "gnn": [{"dim_out": 8, "att_head": 2}],
        "train": [{"batch_size": 300}],
    })
    engine = Engine(data, config)
    stats = engine.train_epoch()
    assert np.isfinite(stats["loss"])
    mrr = engine.evaluate("val")
    assert 0.0 < mrr <= 1.0
