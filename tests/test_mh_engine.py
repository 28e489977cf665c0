"""MultiHostEngine — the N-host super-batch training driver
(parallel/mh_engine.py): protocol exactness at super-batch boundaries,
memory-enabled training end-to-end, and the inherited single-host
surfaces (evaluate / fit) operating on the exchanged state."""
import numpy as np
import pytest

import jax

from tgb_tgn_dgl_tpu.data.dataset import synthetic
from tgb_tgn_dgl_tpu.engine.train import Engine
from tgb_tgn_dgl_tpu.parallel.mh_engine import MultiHostEngine
from tgb_tgn_dgl_tpu.utils.config import parse_config_dict


def _conf(frozen, B=128, arch="transformer_attention"):
    return parse_config_dict({
        "sampling": [{"neighbor": [5]}],
        "memory": [{"dim_out": 16, "dim_time": 16, "mailbox_size": 2}],
        "gnn": [{"arch": arch, "dim_out": 16, "att_head": 2,
                 "dim_time": 16}],
        "train": [{"batch_size": B, "lr": 1e-3, "dropout": 0.0,
                   "att_dropout": 0.0, "frozen_memory": frozen,
                   "seed": 3}],
    })


@pytest.fixture(scope="module")
def mh_data():
    # 1280 train events = 5 super-batches of 2x128 even
    return synthetic("mh-engine", num_edges=1850, num_nodes=150,
                     msg_dim=6, num_neg=4, seed=41)


def test_frozen_driver_state_matches_serial_engine(mh_data):
    """After a multi-host epoch, the packer state equals a serial
    single-host Engine's over the same stream (the exchange invariant,
    end-to-end through the driver), and the inherited streaming eval
    runs on it."""
    mh = MultiHostEngine(mh_data, _conf(frozen=True), n_hosts=2)
    stats = mh.train_epoch()
    assert np.isfinite(stats["loss"])

    single = Engine(mh_data, _conf(frozen=True))
    single.train_epoch()
    np.testing.assert_array_equal(mh.packer.cache_eid,
                                  single.packer.cache_eid)
    np.testing.assert_array_equal(mh.packer.clock, single.packer.clock)
    np.testing.assert_array_equal(mh.packer.mail_ptr,
                                  single.packer.mail_ptr)
    assert mh.packer.cur_e_id == single.packer.cur_e_id

    v = mh.evaluate("val")
    assert 0.0 < v <= 1.0


def test_memory_driver_trains_and_fits(mh_data, tmp_path):
    """Flagship mailbox memory x multi-host: loss decreases across
    epochs, the memory state moves, and the inherited fit() surface
    (eval_every, metrics, checkpoints) drives it."""
    mh = MultiHostEngine(mh_data, _conf(frozen=False), n_hosts=2)
    s1 = mh.train_epoch()
    mem_norm = float(np.abs(np.asarray(mh.mem_state.mem)).sum())
    assert mem_norm > 0, "memory never updated through the chain"
    s2 = mh.train_epoch()
    assert s2["loss"] < s1["loss"]

    hist = mh.fit(epochs=1, log=lambda *a, **k: None,
                  log_dir=str(tmp_path))
    assert len(hist["loss"]) == 1 and len(hist["val"]) == 1


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_memory_driver_on_mesh(mh_data):
    from tgb_tgn_dgl_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh(8, dp=2, state=4)
    mh = MultiHostEngine(mh_data, _conf(frozen=False), n_hosts=2,
                         mesh=mesh)
    stats = mh.train_epoch()
    assert np.isfinite(stats["loss"])


def test_ragged_tail_goes_single_host(mh_data):
    """A train split that is not a multiple of n*B trains its tail
    through the inherited per-batch step; the event count still covers
    the full split."""
    conf = _conf(frozen=True, B=96)   # 1295 train rows -> ragged
    mh = MultiHostEngine(mh_data, conf, n_hosts=2)
    stats = mh.train_epoch()
    n_train = int(np.sum(mh_data.train_mask))
    assert stats["events"] >= n_train


def test_dyrep_driver_trains_and_evals(mh_data):
    """DyRep x multi-host end-to-end (VERDICT r4 item 3): the eager-mail
    chained composed step drives training (loss decreases, memory
    moves), the exchange keeps packer state serial, and the inherited
    streaming eval runs on it."""
    mh = MultiHostEngine(mh_data, _conf(frozen=False, arch="dyrep"),
                         n_hosts=2)
    assert mh.eager_memory
    s1 = mh.train_epoch()
    assert np.isfinite(s1["loss"])
    assert np.abs(np.asarray(mh.mem_state.mem)).sum() > 0, \
        "eager memory never updated through the chain"
    s2 = mh.train_epoch()
    assert s2["loss"] < s1["loss"]
    # exchange invariant holds for the DyRep path too
    single = Engine(mh_data, _conf(frozen=False, arch="dyrep"))
    single.train_epoch()
    single.train_epoch()
    np.testing.assert_array_equal(mh.packer.cache_eid,
                                  single.packer.cache_eid)
    np.testing.assert_array_equal(mh.packer.clock, single.packer.clock)
    v = mh.evaluate("val")
    assert 0.0 < v <= 1.0


def test_jodie_driver_trains_and_evals(mh_data):
    """JODIE (arch='identity') x multi-host: the composed memory step's
    arch dispatch (VERDICT r5 follow-up — it previously hardcoded the
    TGN forward and crashed on JODIE params) trains end-to-end with
    serial exchange state and the inherited streaming eval."""
    cfg = _conf(frozen=False, arch="identity")
    cfg.memory.memory_update = "rnn"
    mh = MultiHostEngine(mh_data, cfg, n_hosts=2)
    s1 = mh.train_epoch()
    assert np.isfinite(s1["loss"])
    assert np.abs(np.asarray(mh.mem_state.mem)).sum() > 0
    s2 = mh.train_epoch()
    assert s2["loss"] < s1["loss"]
    single_cfg = _conf(frozen=False, arch="identity")
    single_cfg.memory.memory_update = "rnn"
    single = Engine(mh_data, single_cfg)
    single.train_epoch()
    single.train_epoch()
    np.testing.assert_array_equal(mh.packer.clock, single.packer.clock)
    v = mh.evaluate("val")
    assert 0.0 < v <= 1.0


def test_dyrep_owned_exchange_matches_replicated(mh_data):
    rep = MultiHostEngine(mh_data, _conf(frozen=False, arch="dyrep"),
                          n_hosts=2, exchange="replicated")
    own = MultiHostEngine(mh_data, _conf(frozen=False, arch="dyrep"),
                          n_hosts=2, exchange="owned")
    s_rep, s_own = rep.train_epoch(), own.train_epoch()
    np.testing.assert_allclose(s_rep["loss"], s_own["loss"], rtol=0,
                               atol=0)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        rep.params, own.params)


@pytest.mark.parametrize("exchange", ["replicated", "owned"])
def test_epoch_trace_has_real_phase_times(mh_data, exchange):
    """The trace must answer 'is host work the binding wall at n hosts'
    with measured numbers, not hardcoded zeros (VERDICT r4 weak-3)."""
    mh = MultiHostEngine(mh_data, _conf(frozen=False), n_hosts=2,
                         exchange=exchange)
    mh.train_epoch()
    tr = mh.last_epoch_trace
    for key in ("pack_s", "disp_s", "exchange_s", "replan_s", "host_s"):
        assert tr[key] > 0.0, f"{key} not measured ({exchange})"
    assert tr["super_batches"] > 0
    assert tr["total_s"] >= tr["pack_s"] + tr["exchange_s"]


def test_host_only_epoch_measures_without_dispatch(mh_data):
    """host_only mode (bench.py's multihost_host_ms probe) runs the
    real host path, counts super-batches, and issues zero device
    dispatches."""
    mh = MultiHostEngine(mh_data, _conf(frozen=False), n_hosts=2)
    d0 = mh.dispatch_count
    mh.train_epoch(host_only=True, max_super_batches=3)
    tr = mh.last_epoch_trace
    assert mh.dispatch_count == d0
    assert tr["super_batches"] == 3
    assert tr["disp_s"] == 0.0
    assert tr["pack_s"] > 0 and tr["exchange_s"] > 0 \
        and tr["replan_s"] > 0 and tr["host_s"] > 0


@pytest.mark.parametrize("frozen", [True, False])
def test_owned_exchange_matches_replicated(mh_data, frozen):
    """exchange='owned' (node-range-owned state + boundary-gathered
    scratch packs) must train IDENTICALLY to the replicated exchange:
    same per-epoch loss, same params, same packer state at the epoch
    boundary — across both the frozen and flagship-memory paths."""
    rep = MultiHostEngine(mh_data, _conf(frozen=frozen), n_hosts=2,
                          exchange="replicated")
    own = MultiHostEngine(mh_data, _conf(frozen=frozen), n_hosts=2,
                          exchange="owned")
    for ep in range(2):
        s_rep = rep.train_epoch()
        s_own = own.train_epoch()
        assert s_rep["events"] == s_own["events"]
        np.testing.assert_allclose(s_rep["loss"], s_own["loss"],
                                   rtol=0, atol=0)
    # bit-identical training trajectories
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        rep.params, own.params)
    # serial packer state handed back exactly
    np.testing.assert_array_equal(rep.packer.cache_eid,
                                  own.packer.cache_eid)
    np.testing.assert_array_equal(rep.packer.clock, own.packer.clock)
    np.testing.assert_array_equal(rep.packer.mail_ptr,
                                  own.packer.mail_ptr)
    # the inherited eval protocol runs on the owned-mode engine
    v_rep, v_own = rep.evaluate("val"), own.evaluate("val")
    np.testing.assert_allclose(v_rep, v_own, rtol=0, atol=0)
