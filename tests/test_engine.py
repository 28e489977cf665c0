"""End-to-end engine tests on a tiny synthetic stream (CPU XLA):
training reduces loss, streaming eval produces a sane MRR, protocol
details (epoch cache reset, per-batch mean of MRR) hold."""
import numpy as np
import pytest

from tgb_tgn_dgl_tpu.data.dataset import synthetic
from tgb_tgn_dgl_tpu.engine.train import Engine
from tgb_tgn_dgl_tpu.utils.config import FrameworkConfig, parse_config_dict

TINY = dict(
    sampling=[dict(neighbor=[5])],
    gnn=[dict(att_head=4, dim_out=32, dim_time=32)],
    train=[dict(epoch=2, batch_size=64, lr=1e-3, dropout=0.1,
                att_dropout=0.1)],
)


@pytest.fixture(scope="module")
def tiny_data():
    return synthetic("tiny", num_edges=1500, num_nodes=120, msg_dim=8,
                     num_neg=8, seed=1)


def test_train_and_eval(tiny_data):
    cfg = parse_config_dict(TINY)
    eng = Engine(tiny_data, cfg)
    s1 = eng.train_epoch()
    s2 = eng.train_epoch()
    assert np.isfinite(s1["loss"]) and np.isfinite(s2["loss"])
    assert s2["loss"] < s1["loss"]
    assert 0.4 < s1["auc"] <= 1.0 or 0.4 < s2["auc"] <= 1.0
    val = eng.evaluate("val")
    assert 0.0 < val <= 1.0
    test = eng.evaluate("test")
    assert 0.0 < test <= 1.0


def test_fit_driver(tiny_data):
    cfg = parse_config_dict(TINY)
    eng = Engine(tiny_data, cfg)
    logs = []
    hist = eng.fit(epochs=1, log=logs.append)
    assert len(hist["loss"]) == 1
    assert len(hist["val"]) == 1
    assert any("Validation" in l for l in logs)


def test_vector_message_mode(tiny_data):
    raw = dict(TINY)
    raw["gnn"] = [dict(att_head=4, dim_out=32, dim_time=32,
                       message_mode="vector")]
    cfg = parse_config_dict(raw)
    eng = Engine(tiny_data, cfg)
    s = eng.train_epoch()
    assert np.isfinite(s["loss"])


def test_learning_signal(tiny_data):
    """The model must actually learn on an easy stream: AUC after a few
    epochs should beat chance clearly."""
    cfg = parse_config_dict(TINY)
    eng = Engine(tiny_data, cfg)
    last = None
    for _ in range(4):
        last = eng.train_epoch()
    assert last["auc"] > 0.6
