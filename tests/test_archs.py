"""End-to-end smoke tests for the model-zoo archs (gnn.arch knob):
JODIE ('identity') and DyRep ('dyrep') — reference modules/memory_module
DyRepMemory + emb_module TimeEmbedding capability."""
import numpy as np
import pytest

from tgb_tgn_dgl_tpu.data.dataset import synthetic
from tgb_tgn_dgl_tpu.engine.train import Engine
from tgb_tgn_dgl_tpu.utils.config import parse_config_dict


def _data():
    return synthetic("tgbl-wiki-small", num_edges=1500, num_nodes=120,
                     msg_dim=6, num_neg=6)


def _config(arch, update="rnn"):
    return parse_config_dict({
        "sampling": [{"neighbor": [5]}],
        "memory": [{"dim_out": 16, "dim_time": 16,
                    "memory_update": update}],
        "gnn": [{"arch": arch, "dim_out": 16, "att_head": 2}],
        "train": [{"batch_size": 250, "lr": 1e-3,
                   "frozen_memory": False}],
    })


@pytest.mark.parametrize("arch", ["identity", "dyrep"])
def test_arch_trains_and_evals(arch):
    data = _data()
    engine = Engine(data, _config(arch))
    assert engine.use_memory
    assert engine.eager_memory == (arch == "dyrep")
    s1 = engine.train_epoch()
    assert np.isfinite(s1["loss"])
    mem = np.asarray(engine.mem_state.mem)
    assert np.abs(mem).sum() > 0, "memory never updated"
    mrr = engine.evaluate("val")
    assert 0.0 < mrr <= 1.0
    s2 = engine.train_epoch()
    assert np.isfinite(s2["loss"])
    # learning signal: AP should move off coin-flip within 2 epochs
    s3 = engine.train_epoch()
    assert s3["ap"] > 0.5


def test_arch_losses_differ():
    """The three archs must genuinely be different models."""
    data = _data()
    losses = {}
    for arch in ("transformer_attention", "identity", "dyrep"):
        engine = Engine(data, _config(arch))
        losses[arch] = engine.train_epoch()["loss"]
    vals = list(losses.values())
    assert len({round(v, 3) for v in vals}) == 3, losses


def test_unknown_arch_rejected():
    data = _data()
    with pytest.raises(ValueError, match="unknown gnn.arch"):
        Engine(data, _config("not_an_arch"))
