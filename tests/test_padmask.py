"""pad_mask ragged-negative eval: correctness vs oracle, divergence vs
truncate_min.

TGB's pre-generated negative sets can be ragged (collision filtering);
the reference truncates every row to the batch min length
(/root/reference/epoch_utils.py:48-56), silently dropping negatives.
``train.eval_neg_mode='pad_mask'`` pads to the max length and masks —
strictly more faithful to TGB.  This test proves the device path:

  * pad_mask MRR == an independent oracle (torch lockstep forward +
    the numpy ``evaluator.mrr(neg_mask=...)`` reduction) to fp noise,
    through the chunked + fused eval dispatch (masks ride the
    lax.scan'd fused chunks);
  * pad_mask and truncate_min provably differ on ragged sets.
"""
import numpy as np
import pytest

from tgb_tgn_dgl_tpu.data.dataset import synthetic
from tgb_tgn_dgl_tpu.engine.evaluator import mrr as np_mrr
from tgb_tgn_dgl_tpu.engine.train import Engine
from tgb_tgn_dgl_tpu.utils.config import parse_config_dict


def _ragged_data(seed=5):
    data = synthetic("padmask", num_edges=1500, num_nodes=300, msg_dim=8,
                     num_neg=6, seed=seed)
    rng = np.random.default_rng(seed)
    uni = data.unique_dst()
    n_val = int(data.val_mask.sum())
    ns = np.empty(n_val, object)
    pos = data.dst[data.val_mask]
    for i in range(n_val):
        m = int(rng.integers(3, 10))          # ragged: 3..9 negatives
        row = rng.choice(uni, m).astype(np.int32)
        row[row == pos[i]] = uni[0] if uni[0] != pos[i] else uni[1]
        ns[i] = row
    data.val_ns = ns
    return data


def _engine(data, mode):
    config = parse_config_dict({
        "sampling": [{"neighbor": [10], "num_thread": 2}],
        "gnn": [{"dim_out": 32, "att_head": 4, "layer": 1}],
        "train": [{"batch_size": 250, "lr": 1e-4, "dropout": 0.0,
                   "att_dropout": 0.0, "fuse_steps": 4,
                   "max_intra_block": None,  # exact reference semantics
                   "eval_neg_chunk": 3,      # force chunking + fusion
                   "eval_neg_mode": mode, "compute_dtype": "float32"}],
    })
    return Engine(data, config)


def test_pad_mask_matches_oracle_and_differs_from_truncate():
    from baselines.lockstep import LockstepReference

    import jax
    import jax.numpy as jnp
    import torch

    data = _ragged_data()
    eng_pad = _engine(data, "pad_mask")
    eng_trunc = _engine(data, "truncate_min")
    # An untrained model over the all-ones frozen memory produces logits
    # clustered within ~1e-3, so ranks flip on fp near-ties.  Use a
    # RANDOM frozen memory (same table on all three sides) to separate
    # node embeddings by O(1) — rank counting is then fp-stable.
    mem = np.random.default_rng(11).normal(
        0, 1, (data.num_nodes, 32)).astype(np.float32)
    eng_pad.memory = jnp.asarray(mem)
    eng_trunc.memory = jnp.asarray(mem)
    params_np = jax.tree.map(np.asarray, eng_pad.params)
    oracle = LockstepReference(data, params_np, num_neighbors=10)
    oracle.memory = torch.from_numpy(mem)
    d = data

    mrr_pad = eng_pad.evaluate("val")
    mrr_trunc = eng_trunc.evaluate("val")
    batch_means = []
    for lo, hi, rows, blk in eng_pad._iter_batches("val"):
        rows_ns = d.val_ns[lo:hi]
        m = max(len(r) for r in rows_ns)
        neg2d = np.zeros((len(rows), m), np.int64)
        mask = np.zeros((len(rows), m), bool)
        for i, r in enumerate(rows_ns):
            neg2d[i, :len(r)] = r
            mask[i, :len(r)] = True
        _, pos, negl = oracle.eval_batch(d.src[rows], d.dst[rows],
                                         d.t[rows], rows, blk, neg2d)
        batch_means.append(np_mrr(pos, negl, neg_mask=mask).mean())
    oracle_mrr = float(np.mean(batch_means))

    assert abs(mrr_pad - oracle_mrr) < 1e-5, (
        f"pad_mask {mrr_pad:.6f} vs oracle {oracle_mrr:.6f}")
    assert abs(mrr_pad - mrr_trunc) > 0.005, (
        f"ragged sets must separate the modes: pad {mrr_pad:.6f} "
        f"trunc {mrr_trunc:.6f}")


def test_rectangular_sets_mode_invariant():
    """With rectangular negatives the two modes are the same protocol."""
    data = synthetic("padmask-rect", num_edges=1200, num_nodes=250,
                     msg_dim=8, num_neg=5, seed=7)
    a = _engine(data, "pad_mask").evaluate("val")
    b = _engine(data, "truncate_min").evaluate("val")
    assert abs(a - b) < 1e-7
