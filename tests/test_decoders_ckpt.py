"""Tests for decoder heads (models/decoders.py) and checkpoint/early-stop
(engine/checkpoint.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tgb_tgn_dgl_tpu.engine.checkpoint import (EarlyStopMonitor, load_pytree,
                                               save_pytree)
from tgb_tgn_dgl_tpu.models.decoders import (conv_transe, init_conv_transe,
                                             init_link_predictor,
                                             init_node_predictor,
                                             link_predictor, node_predictor)


def test_link_predictor_shapes_and_broadcast():
    p = init_link_predictor(jax.random.PRNGKey(0), 16)
    z = jax.random.normal(jax.random.PRNGKey(1), (7, 16))
    zn = jax.random.normal(jax.random.PRNGKey(2), (7, 5, 16))
    pos = link_predictor(p, z, z)
    neg = link_predictor(p, z, zn)
    assert pos.shape == (7,)
    assert neg.shape == (7, 5)
    # broadcast consistency: (B, 1, D) negatives == (B, D) positives
    neg1 = link_predictor(p, z, z[:, None, :])
    np.testing.assert_allclose(np.asarray(neg1[:, 0]), np.asarray(pos),
                               rtol=1e-5, atol=1e-6)


def test_link_predictor_matches_torch_mlp():
    torch = pytest.importorskip("torch")
    p = init_link_predictor(jax.random.PRNGKey(3), 8)
    lin_src = torch.nn.Linear(8, 8)
    lin_dst = torch.nn.Linear(8, 8)
    lin_final = torch.nn.Linear(8, 1)
    with torch.no_grad():
        for lin, pp in ((lin_src, p["lin_src"]), (lin_dst, p["lin_dst"]),
                        (lin_final, p["lin_final"])):
            lin.weight.copy_(torch.from_numpy(np.asarray(pp["w"]).T))
            lin.bias.copy_(torch.from_numpy(np.asarray(pp["b"])))
    rng = np.random.default_rng(0)
    a = rng.normal(size=(4, 8)).astype(np.float32)
    b = rng.normal(size=(4, 8)).astype(np.float32)
    ours = np.asarray(link_predictor(p, jnp.asarray(a), jnp.asarray(b)))
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    theirs = lin_final(
        torch.relu(lin_src(ta) + lin_dst(tb))).squeeze(-1).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_node_predictor():
    p = init_node_predictor(jax.random.PRNGKey(0), 12, num_classes=3)
    out = node_predictor(p, jnp.ones((5, 12)))
    assert out.shape == (5, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_conv_transe_shapes_and_bn_state():
    params, state = init_conv_transe(jax.random.PRNGKey(0), 16, channels=8)
    ents = jax.random.normal(jax.random.PRNGKey(1), (30, 16))
    sub = ents[:6]
    rel = jax.random.normal(jax.random.PRNGKey(2), (6, 16))
    scores, st2 = conv_transe(params, state, ents, sub, rel, train=True,
                              rng=jax.random.PRNGKey(3))
    assert scores.shape == (6, 30)
    assert np.isfinite(np.asarray(scores)).all()
    # training updated the running stats
    assert not np.allclose(np.asarray(st2.bn1.mean),
                           np.asarray(state.bn1.mean))
    # eval mode: deterministic, uses running stats, state unchanged
    s_eval, st3 = conv_transe(params, st2, ents, sub, rel, train=False)
    s_eval2, _ = conv_transe(params, st2, ents, sub, rel, train=False)
    np.testing.assert_allclose(np.asarray(s_eval), np.asarray(s_eval2))
    assert st3 is st2 or np.allclose(np.asarray(st3.bn1.mean),
                                     np.asarray(st2.bn1.mean))


def test_pytree_checkpoint_roundtrip(tmp_path):
    tree = {
        "a": jnp.arange(6).reshape(2, 3).astype(jnp.float32),
        "nested": {"b": np.ones(4, np.int64), "c": jnp.float32(2.5)},
    }
    path = str(tmp_path / "ck.npz")
    save_pytree(path, tree)
    out = load_pytree(path, jax.tree.map(jnp.zeros_like, tree))
    np.testing.assert_array_equal(np.asarray(out["a"]), np.asarray(tree["a"]))
    np.testing.assert_array_equal(out["nested"]["b"], tree["nested"]["b"])
    assert float(out["nested"]["c"]) == 2.5


def test_early_stop_monitor(tmp_path):
    mon = EarlyStopMonitor(max_round=2, save_dir=str(tmp_path), name="m")
    state = {"w": jnp.ones(3)}
    assert not mon.step_check(0.5, state)        # best
    assert not mon.step_check(0.6, {"w": 2 * jnp.ones(3)})  # better
    assert not mon.step_check(0.55, state)       # worse (1)
    assert mon.step_check(0.54, state)           # worse (2) -> stop
    assert mon.best_epoch == 2
    best = mon.load_best({"w": jnp.zeros(3)})
    np.testing.assert_array_equal(np.asarray(best["w"]), 2 * np.ones(3))


def test_engine_checkpoint_resume(tmp_path):
    """Full-state save/load reproduces identical continued training."""
    from tgb_tgn_dgl_tpu.data.dataset import synthetic
    from tgb_tgn_dgl_tpu.engine.train import Engine
    from tgb_tgn_dgl_tpu.utils.config import parse_config_dict

    data = synthetic("tgbl-wiki-small", num_edges=1200, num_nodes=100,
                     msg_dim=4, num_neg=4)
    conf = {
        "sampling": [{"neighbor": [5]}],
        "memory": [{"dim_out": 8, "dim_time": 8}],
        "gnn": [{"dim_out": 8, "att_head": 2}],
        "train": [{"batch_size": 200, "lr": 1e-3, "frozen_memory": False,
                   "seed": 7}],
    }
    e1 = Engine(data, parse_config_dict(conf))
    e1.train_epoch()
    path = str(tmp_path / "full.npz")
    e1.save_checkpoint(path)
    loss_a = e1.train_epoch()["loss"]

    e2 = Engine(data, parse_config_dict(conf))
    e2.load_checkpoint(path)
    loss_b = e2.train_epoch()["loss"]
    assert loss_a == pytest.approx(loss_b, rel=1e-5)


def test_engine_resume_epoch_cursor(tmp_path):
    """fit() tracks the epoch cursor through checkpoints: interrupt after
    2 epochs + resume(1) == uninterrupted 3 epochs (params match), and
    epoch labels continue (the run_tgn.py --resume contract)."""
    from tgb_tgn_dgl_tpu.data.dataset import synthetic
    from tgb_tgn_dgl_tpu.engine.train import Engine
    from tgb_tgn_dgl_tpu.utils.config import parse_config_dict

    data = synthetic("tgbl-wiki-small", num_edges=1000, num_nodes=90,
                     msg_dim=4, num_neg=4)
    conf = {
        "sampling": [{"neighbor": [5]}],
        "memory": [{"dim_out": 8, "dim_time": 8}],
        "gnn": [{"dim_out": 8, "att_head": 2}],
        "train": [{"batch_size": 200, "lr": 1e-3, "frozen_memory": False,
                   "seed": 3}],
    }
    quiet = lambda *a, **k: None  # noqa: E731

    ref = Engine(data, parse_config_dict(conf))
    ref.fit(epochs=3, log=quiet)

    e1 = Engine(data, parse_config_dict(conf))
    e1.fit(epochs=2, log=quiet)
    assert e1._epoch == 2
    path = str(tmp_path / "cursor.npz")
    e1.save_checkpoint(path)

    e2 = Engine(data, parse_config_dict(conf))
    e2.load_checkpoint(path)
    assert e2._epoch == 2
    labels = []
    e2.fit(epochs=1, log=lambda m: labels.append(m))
    assert e2._epoch == 3
    assert any("Epoch: 03" in m for m in labels)
    for a, b in zip(jax.tree_util.tree_leaves(ref.params),
                    jax.tree_util.tree_leaves(e2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
