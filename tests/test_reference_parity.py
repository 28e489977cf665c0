"""Lockstep parity: the JAX dense-grid flagship vs the reference math.

The single structural bet of this framework is that ONE dense masked pass
over a host-packed (R, Kp) grid (models/tgnn.py, data/packer.py) computes
the same function as the reference's sequential sub-block loop with a
growing DGL graph (/root/reference/model_utils.py:61-159).  This test
proves it against an INDEPENDENT torch re-execution of the reference math
(baselines/lockstep.py: naive per-node-list cache, dynamic COO, live
per-block clocks — no shared code or data structures with the packer):

  * per-batch pos/neg logits and loss agree to fp tolerance through a
    full training epoch (both sides take real Adam steps in lockstep,
    so agreement at batch k also certifies the gradients at batch k-1);
  * the streaming-eval MRR (fixed negatives, eval clock-wipe quirk,
    TGB tie convention) agrees to < 0.5% — the north-star parity bar
    (BASELINE.md).

Protocol pins (reference file:line):
  frozen all-ones memory (model_utils.py:270-271), dropout 0 both sides,
  persistent clocks (model_utils.py:22), cache reset at train-epoch start
  (epoch_utils.py:175), eval streams on without reset inserting events
  (epoch_utils.py:157, pyg-mem-tgn.py:54-63), max_intra_block=None
  (exact growing-graph semantics).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tgb_tgn_dgl_tpu.data.dataset import synthetic
from tgb_tgn_dgl_tpu.engine.train import Engine
from tgb_tgn_dgl_tpu.utils.config import parse_config_dict


def _make_engine():
    data = synthetic("parity", num_edges=2400, num_nodes=400, msg_dim=16,
                     num_neg=8, seed=3)
    config = parse_config_dict({
        "sampling": [{"neighbor": [10], "num_thread": 2}],
        "gnn": [{"dim_out": 32, "att_head": 4, "layer": 1}],
        "train": [{"batch_size": 300, "lr": 1e-4, "dropout": 0.0,
                   "att_dropout": 0.0, "max_intra_block": None,
                   "fuse_steps": 1, "compute_dtype": "float32"}],
    })
    return data, Engine(data, config)


def _engine_train_batches(engine):
    """Drive the engine per batch (the non-fused path of
    Engine.train_epoch), yielding the per-batch inputs and outputs."""
    d = engine.data
    engine.packer.reset_cache()
    acc = jnp.zeros(4, jnp.float32)
    for lo, hi, rows, blk in engine._iter_batches("train"):
        src, dst, t = d.src[rows], d.dst[rows], d.t[rows]
        neg = engine.neg_sampler.sample(dst)
        out = engine._pack_dedup(src, dst, t, rows, blk, neg, False)
        if out is not None:
            wire, iw = out
        else:
            wire, iw = engine.packer.pack_wire(src, dst, t, rows, blk, neg)
            wire = engine._maybe_compact(wire, iw)
        engine._rng, sk = jax.random.split(engine._rng)
        (engine.params, engine.opt_state, loss, pos, negl,
         acc) = engine._train_step(engine.params, engine.opt_state,
                                   engine.memory, engine._tables, wire,
                                   sk, acc, iw)
        n = hi - lo
        yield (src, dst, t, rows, blk, neg, float(loss),
               np.asarray(pos)[:n], np.asarray(negl)[:n])


@pytest.fixture(scope="module")
def lockstep_run():
    """One full lockstep epoch + val pass, shared by the assertions."""
    from baselines.lockstep import LockstepReference

    data, engine = _make_engine()
    params_np = jax.tree.map(np.asarray, engine.params)
    oracle = LockstepReference(data, params_np,
                               num_neighbors=10, lr=1e-4)
    oracle.reset_cache()

    batches = []
    for (src, dst, t, rows, blk, neg, jloss, jpos,
         jneg) in _engine_train_batches(engine):
        oloss, opos, oneg = oracle.train_batch(src, dst, t, rows, blk, neg)
        batches.append(dict(jloss=jloss, oloss=oloss, jpos=jpos,
                            opos=opos, jneg=jneg, oneg=oneg))

    # streaming val on both sides (no reset; state flows from train)
    jax_mrr = engine.evaluate("val")
    d = data
    mrrs = []
    for lo, hi, rows, blk in engine._iter_batches("val"):
        neg2d = d.val_ns[lo:hi]
        mrr, _, _ = oracle.eval_batch(d.src[rows], d.dst[rows], d.t[rows],
                                      rows, blk, neg2d)
        mrrs.append(mrr)
    oracle_mrr = float(np.mean(mrrs))
    return batches, jax_mrr, oracle_mrr


def test_per_batch_logit_parity(lockstep_run):
    batches, _, _ = lockstep_run
    assert len(batches) >= 3
    for i, b in enumerate(batches):
        dp = np.max(np.abs(b["jpos"] - b["opos"]))
        dn = np.max(np.abs(b["jneg"] - b["oneg"]))
        tol = 2e-4 if i == 0 else 2e-3   # fp drift across Adam steps
        assert dp < tol and dn < tol, (
            f"batch {i}: |Δpos|={dp:.2e} |Δneg|={dn:.2e} (tol {tol:.0e})")


def test_per_batch_loss_parity(lockstep_run):
    batches, _, _ = lockstep_run
    for i, b in enumerate(batches):
        assert abs(b["jloss"] - b["oloss"]) < 2e-4, (
            f"batch {i}: jax loss {b['jloss']:.6f} vs "
            f"reference {b['oloss']:.6f}")


def test_epoch_val_mrr_parity(lockstep_run):
    _, jax_mrr, oracle_mrr = lockstep_run
    rel = abs(jax_mrr - oracle_mrr) / max(oracle_mrr, 1e-9)
    assert rel < 0.005, (
        f"val MRR parity: jax {jax_mrr:.6f} vs reference {oracle_mrr:.6f} "
        f"(rel diff {rel:.4%}, bar 0.5%)")
