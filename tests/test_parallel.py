"""Multi-device tests on the simulated 8-device CPU mesh (conftest forces
xla_force_host_platform_device_count=8) — SURVEY.md §4/§7 phase 5."""
import numpy as np
import pytest

import jax

from tgb_tgn_dgl_tpu.parallel import mesh as mesh_lib


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_shapes():
    m = mesh_lib.make_mesh(8)
    assert m.shape["dp"] * m.shape["state"] == 8
    m2 = mesh_lib.make_mesh(8, dp=8, state=1)
    assert dict(m2.shape) == {"dp": 8, "state": 1}


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 devices")
def test_dryrun_multichip_2():
    import __graft_entry__ as ge
    ge.dryrun_multichip(2)


def test_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    pos, neg = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(pos)).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_step_matches_single_device():
    """The dp×state sharded train step computes the same loss/updates as
    the single-device step (same inputs, deterministic rng)."""
    import optax
    import __graft_entry__ as ge
    from tgb_tgn_dgl_tpu.parallel.sharded import build_sharded_train_step
    from tgb_tgn_dgl_tpu.models.tgnn import bce_loss, tgnn_forward

    model_cfg, params, memory, feats, pack, _ = ge._make_example(
        batch_size=64, num_nodes=256, msg_dim=16, hidden=32, heads=4, seed=3)
    # disable dropout so single vs sharded rngs agree
    model_cfg = model_cfg._replace(feat_drop=0.0, attn_drop=0.0)
    # SGD, not Adam: Adam's first step is ~lr*sign(grad), so a near-zero
    # gradient coordinate whose SIGN differs between the two layouts'
    # reduction orders produces a full 2*lr param difference — an
    # amplifier of benign fp reassociation, not a layout bug.  SGD keeps
    # the comparison linear in the gradient.
    optimizer = optax.sgd(1e-2)
    rng = jax.random.PRNGKey(0)

    def single_step(params, memory, feats, pack):
        opt_state = optimizer.init(params)

        def loss_fn(p):
            pos, neg = tgnn_forward(p, model_cfg, memory, feats, pack,
                                    train=True, rng=rng)
            return bce_loss(pos, neg, pack.ev_valid), (pos, neg)

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, _ = optimizer.update(grads, opt_state, params)
        return loss, optax.apply_updates(params, updates)

    loss1, params1 = jax.jit(single_step)(params, memory, feats,
                                          pack.device())

    mesh = mesh_lib.make_mesh(8, dp=4, state=2)
    step, placement = build_sharded_train_step(model_cfg, optimizer, mesh)
    opt_state = optimizer.init(params)
    args = placement(params, opt_state, memory, feats, pack)
    params2, _, loss2, _, _ = step(*args, rng)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-5)
    flat1 = jax.tree.leaves(params1)
    flat2 = jax.tree.leaves(params2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_sharded_memory_train_step_8dev():
    """The FULL flagship step (mailbox memory + wire) over a dp x state
    mesh: compiles, executes, memory updates propagate, loss finite."""
    import __graft_entry__ as graft
    graft.dryrun_multichip(8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_engine_matches_single():
    """Full EPOCH-level parity: ShardedEngine (dp x state mesh) trains
    and evaluates to the same numbers as the single-device Engine
    (dropout off, fuse off, SGD-free comparison via loss/MRR values)."""
    from tgb_tgn_dgl_tpu.data.dataset import synthetic
    from tgb_tgn_dgl_tpu.engine.train import Engine
    from tgb_tgn_dgl_tpu.parallel.engine import ShardedEngine
    from tgb_tgn_dgl_tpu.utils.config import parse_config_dict

    data = synthetic("tiny-sharded", num_edges=1024, num_nodes=128,
                     msg_dim=8, num_neg=6, seed=7)
    raw = {
        "sampling": [{"neighbor": [5]}],
        "memory": [{"dim_out": 32, "dim_time": 32, "mailbox_size": 2}],
        "gnn": [{"dim_out": 32, "att_head": 4, "dim_time": 32}],
        "train": [{"batch_size": 128, "lr": 1e-3, "dropout": 0.0,
                   "att_dropout": 0.0, "frozen_memory": False,
                   "fuse_steps": 0, "wire_dedup": False,
                   "wire_compact": False}],
    }
    single = Engine(data, parse_config_dict(raw))
    l1 = single.train_epoch()["loss"]
    v1 = single.evaluate("val")

    sh = ShardedEngine(data, parse_config_dict(raw),
                       mesh=mesh_lib.make_mesh(8, dp=4, state=2))
    s = sh.train_epoch()
    l2 = s["loss"]
    v2 = sh.evaluate("val")
    # same math, different reduction layouts -> tight but not bitwise
    np.testing.assert_allclose(l1, l2, rtol=2e-4)
    np.testing.assert_allclose(v1, v2, rtol=2e-4)

    # a second epoch keeps training (protocol holds across epochs)
    s2 = sh.train_epoch()
    assert s2["loss"] < s["loss"]


def test_sharded_engine_fused_compact_exact():
    """The sharded fused dispatch (lax.scan over stacked wires) and the
    narrow-dtype CompactWire must reproduce the per-batch full-wire
    numbers exactly, and eval must accumulate ranks on device (one D2H
    per pass) to the same MRR."""
    from tgb_tgn_dgl_tpu.data.dataset import synthetic
    from tgb_tgn_dgl_tpu.parallel.engine import ShardedEngine
    from tgb_tgn_dgl_tpu.utils.config import parse_config_dict

    data = synthetic("tiny-sharded-f", num_edges=1024, num_nodes=128,
                     msg_dim=8, num_neg=6, seed=11)
    base = {
        "sampling": [{"neighbor": [5]}],
        "memory": [{"dim_out": 32, "dim_time": 32}],
        "gnn": [{"dim_out": 32, "att_head": 4, "dim_time": 32}],
        "train": [{"batch_size": 128, "lr": 1e-3, "dropout": 0.0,
                   "att_dropout": 0.0, "frozen_memory": False,
                   "fuse_steps": 0, "wire_compact": False}],
    }
    fused = {**base, "train": [{**base["train"][0], "fuse_steps": 3,
                                "wire_compact": True}]}
    mesh = mesh_lib.make_mesh(8, dp=4, state=2)
    a = ShardedEngine(data, parse_config_dict(base), mesh=mesh)
    b = ShardedEngine(data, parse_config_dict(fused), mesh=mesh)
    a.warm_buckets()
    b.warm_buckets()
    sa = a.train_epoch()
    sb = b.train_epoch()
    np.testing.assert_allclose(sa["loss"], sb["loss"], rtol=1e-5)
    va = a.evaluate("val")
    vb = b.evaluate("val")
    np.testing.assert_allclose(va, vb, rtol=1e-5)


def test_sharded_dispatch_count_near_single():
    """VERDICT r2 item 6 'done' bar: the sharded engine's device
    dispatches per train epoch + eval pass stay within ~2x of the
    single-chip engine's under the same fused config."""
    from tgb_tgn_dgl_tpu.data.dataset import synthetic
    from tgb_tgn_dgl_tpu.engine.train import Engine
    from tgb_tgn_dgl_tpu.parallel.engine import ShardedEngine
    from tgb_tgn_dgl_tpu.utils.config import parse_config_dict

    data = synthetic("tiny-dispatch", num_edges=2048, num_nodes=128,
                     msg_dim=8, num_neg=6, seed=13)
    raw = {
        "sampling": [{"neighbor": [5]}],
        "memory": [{"dim_out": 16, "dim_time": 16}],
        "gnn": [{"dim_out": 16, "att_head": 2, "dim_time": 16}],
        "train": [{"batch_size": 128, "lr": 1e-3, "fuse_steps": 4,
                   "frozen_memory": False}],
    }
    single = Engine(data, parse_config_dict(raw))
    single.warm_buckets()
    single.train_epoch()
    single.evaluate("val")
    n_single = single.dispatch_count

    sh = ShardedEngine(data, parse_config_dict(raw),
                       mesh=mesh_lib.make_mesh(8, dp=4, state=2))
    sh.warm_buckets()
    sh.train_epoch()
    sh.evaluate("val")
    n_sh = sh.dispatch_count
    assert n_single > 0 and n_sh > 0
    assert n_sh <= 2 * n_single, (n_sh, n_single)


@pytest.mark.parametrize("frozen", [True, False])
def test_sharded_slot_unique_eval_matches_single(frozen):
    """VERDICT r4 item 2 'done' bar: with the slot-unique protocol
    active, ShardedEngine's val MRR equals the single-chip Engine's
    BIT-FOR-BIT, and its eval dispatch count is within ~2x of the
    single-chip slot-unique pass (one fused step per batch — not the
    old ~M/Mc chunk dispatches)."""
    from tgb_tgn_dgl_tpu.data.dataset import synthetic
    from tgb_tgn_dgl_tpu.engine.train import Engine
    from tgb_tgn_dgl_tpu.parallel.engine import ShardedEngine
    from tgb_tgn_dgl_tpu.utils.config import parse_config_dict

    data = synthetic("sharded-uniq", num_edges=1024, num_nodes=128,
                     msg_dim=8, num_neg=24, seed=17)
    raw = {
        "sampling": [{"neighbor": [5]}],
        "memory": [{"dim_out": 32, "dim_time": 32, "mailbox_size": 2}],
        "gnn": [{"dim_out": 32, "att_head": 4, "dim_time": 32}],
        "train": [{"batch_size": 128, "lr": 1e-3, "dropout": 0.0,
                   "att_dropout": 0.0, "frozen_memory": frozen,
                   "eval_slot_unique": True, "fuse_steps": 0,
                   "wire_compact": False}],
    }
    single = Engine(data, parse_config_dict(raw))
    assert single._eval_unique_supported()
    single.warm_buckets()
    single.train_epoch()
    single.dispatch_count = 0
    v1 = single.evaluate("val")

    sh = ShardedEngine(data, parse_config_dict(raw),
                       mesh=mesh_lib.make_mesh(8, dp=4, state=2))
    assert sh._eval_unique_supported()
    active, _ = sh._eval_unique_active("val", data.val_ns, 128)
    assert active, "sharded slot-unique gate must open here"
    sh.warm_buckets()
    sh.train_epoch()
    sh.dispatch_count = 0
    v2 = sh.evaluate("val")
    np.testing.assert_allclose(v1, v2, rtol=0, atol=0)
    assert sh.dispatch_count <= 2 * single.dispatch_count, (
        sh.dispatch_count, single.dispatch_count)
    # test split streams on from the val state identically
    np.testing.assert_allclose(single.evaluate("test"),
                               sh.evaluate("test"), rtol=0, atol=0)


def test_sharded_jodie_matches_single():
    """ShardedEngine arch dispatch (it previously hardcoded TGN and
    silently ignored gnn.arch): JODIE trains/evals on the mesh to the
    single-chip Engine's numbers; DyRep is rejected loudly."""
    from tgb_tgn_dgl_tpu.data.dataset import synthetic
    from tgb_tgn_dgl_tpu.engine.train import Engine
    from tgb_tgn_dgl_tpu.parallel.engine import ShardedEngine
    from tgb_tgn_dgl_tpu.utils.config import parse_config_dict

    data = synthetic("sharded-jodie", num_edges=1024, num_nodes=128,
                     msg_dim=8, num_neg=6, seed=23)
    raw = {
        "sampling": [{"neighbor": [5]}],
        "memory": [{"dim_out": 32, "dim_time": 32,
                    "memory_update": "rnn"}],
        "gnn": [{"arch": "identity", "dim_out": 32, "att_head": 4}],
        "train": [{"batch_size": 128, "lr": 1e-3, "dropout": 0.0,
                   "att_dropout": 0.0, "frozen_memory": False,
                   "fuse_steps": 0, "wire_dedup": False,
                   "wire_compact": False}],
    }
    single = Engine(data, parse_config_dict(raw))
    l1 = single.train_epoch()["loss"]
    v1 = single.evaluate("val")

    sh = ShardedEngine(data, parse_config_dict(raw),
                       mesh=mesh_lib.make_mesh(8, dp=4, state=2))
    assert sh.arch == "identity"
    s = sh.train_epoch()
    np.testing.assert_allclose(l1, s["loss"], rtol=2e-4)
    np.testing.assert_allclose(v1, sh.evaluate("val"), rtol=2e-4)

    dyrep = {**raw, "gnn": [{**raw["gnn"][0], "arch": "dyrep"}]}
    with pytest.raises(ValueError, match="dyrep"):
        ShardedEngine(data, parse_config_dict(dyrep),
                      mesh=mesh_lib.make_mesh(8, dp=4, state=2))


def test_sharded_lean_chunk_eval_matches_plain():
    """When the slot-unique gate is closed (eval_slot_unique=False) the
    sharded chunk protocol ships EVAL-LEAN dedup wires; MRR must equal
    the plain-wire chunk protocol exactly (wire_dedup=False arm)."""
    from tgb_tgn_dgl_tpu.data.dataset import synthetic
    from tgb_tgn_dgl_tpu.parallel.engine import ShardedEngine
    from tgb_tgn_dgl_tpu.utils.config import parse_config_dict

    data = synthetic("sharded-lean", num_edges=1024, num_nodes=128,
                     msg_dim=8, num_neg=24, seed=19)
    base = {
        "sampling": [{"neighbor": [5]}],
        "memory": [{"dim_out": 32, "dim_time": 32}],
        "gnn": [{"dim_out": 32, "att_head": 4, "dim_time": 32}],
        "train": [{"batch_size": 128, "lr": 1e-3, "dropout": 0.0,
                   "att_dropout": 0.0, "frozen_memory": False,
                   "eval_slot_unique": False, "fuse_steps": 3}],
    }
    plain = {**base, "train": [{**base["train"][0],
                                "wire_dedup": False}]}
    mesh = mesh_lib.make_mesh(8, dp=4, state=2)
    a = ShardedEngine(data, parse_config_dict(base), mesh=mesh)
    assert a._eval_dedup_ok()
    b = ShardedEngine(data, parse_config_dict(plain), mesh=mesh)
    assert not b._eval_dedup_ok()
    for eng in (a, b):
        eng.warm_buckets()
        eng.train_epoch()
    va, vb = a.evaluate("val"), b.evaluate("val")
    np.testing.assert_allclose(va, vb, rtol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_engine_checkpoint_resume(tmp_path):
    """ShardedEngine full-state save/load reproduces identical continued
    training on the (dp, state) mesh — the multi-chip mirror of
    test_decoders_ckpt::test_engine_checkpoint_resume (VERDICT r3 item 3;
    SURVEY.md §5.3 multi-host recovery = restart from checkpoint)."""
    from tgb_tgn_dgl_tpu.data.dataset import synthetic
    from tgb_tgn_dgl_tpu.parallel.engine import ShardedEngine
    from tgb_tgn_dgl_tpu.utils.config import parse_config_dict

    data = synthetic("sharded-ckpt", num_edges=1024, num_nodes=128,
                     msg_dim=8, num_neg=4, seed=11)
    raw = {
        "sampling": [{"neighbor": [5]}],
        "memory": [{"dim_out": 16, "dim_time": 16, "mailbox_size": 2}],
        "gnn": [{"dim_out": 16, "att_head": 2, "dim_time": 16}],
        "train": [{"batch_size": 256, "lr": 1e-3, "dropout": 0.0,
                   "att_dropout": 0.0, "frozen_memory": False,
                   "seed": 7}],
    }
    mesh = mesh_lib.make_mesh(8, dp=4, state=2)
    e1 = ShardedEngine(data, parse_config_dict(raw), mesh=mesh)
    e1.train_epoch()
    path = str(tmp_path / "sharded.npz")
    e1.save_checkpoint(path)
    loss_a = e1.train_epoch()["loss"]
    val_a = e1.evaluate("val")

    e2 = ShardedEngine(data, parse_config_dict(raw), mesh=mesh)
    e2.load_checkpoint(path)
    loss_b = e2.train_epoch()["loss"]
    val_b = e2.evaluate("val")
    assert loss_a == pytest.approx(loss_b, rel=1e-5)
    assert val_a == pytest.approx(val_b, rel=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_engine_fit_operational(tmp_path):
    """ShardedEngine.fit drives eval_every, jsonl metrics, periodic
    checkpoints, val-snapshot protection and patience early-stopping —
    the single-chip Engine.fit surface (VERDICT r3 items 3/weak-4)."""
    import json
    import os

    from tgb_tgn_dgl_tpu.data.dataset import synthetic
    from tgb_tgn_dgl_tpu.engine.checkpoint import EarlyStopMonitor
    from tgb_tgn_dgl_tpu.parallel.engine import ShardedEngine
    from tgb_tgn_dgl_tpu.utils.config import parse_config_dict

    data = synthetic("sharded-fit", num_edges=768, num_nodes=96,
                     msg_dim=4, num_neg=4, seed=5)
    raw = {
        "sampling": [{"neighbor": [4]}],
        "memory": [{"dim_out": 8, "dim_time": 8}],
        "gnn": [{"dim_out": 8, "att_head": 2, "dim_time": 8}],
        "train": [{"batch_size": 128, "lr": 1e-3,
                   "frozen_memory": False}],
    }
    eng = ShardedEngine(data, parse_config_dict(raw),
                        mesh=mesh_lib.make_mesh(8, dp=2, state=4))
    mon = EarlyStopMonitor(max_round=1, save_dir=str(tmp_path / "best"))
    hist = eng.fit(epochs=4, log=lambda *a, **k: None, eval_every=1,
                   early_stop=mon,
                   checkpoint_dir=str(tmp_path / "ckpt"),
                   checkpoint_every=1, log_dir=str(tmp_path),
                   val_snapshot=True)
    assert len(hist["loss"]) >= 1
    assert len(hist["val"]) == len(hist["loss"])   # eval_every=1
    # jsonl metrics written
    lines = open(tmp_path / "metrics.jsonl").read().splitlines()
    events = [json.loads(l)["event"] for l in lines]
    assert "train_epoch" in events and "val" in events
    # periodic full-state checkpoints exist
    assert os.path.exists(tmp_path / "ckpt" / "ckpt_epoch0001.npz")
    # early stop saved a best model; epoch cursor advanced
    assert os.path.exists(mon.best_path)
    assert eng._epoch == len(hist["loss"])
