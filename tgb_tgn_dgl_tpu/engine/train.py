"""Training/eval engine: the L4 epoch loops (reference epoch_utils.py).

Pipeline per batch: host packer (data/packer.py — CPU, overlappable) →
one jitted dense device step (model forward [+ grad + Adam]) → host
metric bookkeeping.  Protocol fidelity (SURVEY.md §7.4 item 3):

  * neighbor cache resets at each train-epoch start, clocks persist
    (epoch_utils.py:175; time_assoc is never reset);
  * validation streams on from the train state without reset and keeps
    inserting events (epoch_utils.py:157; pyg-mem-tgn.py:54-63);
  * eval uses fixed negatives and the TGB MRR evaluator per batch, final
    metric = mean of per-batch means (epoch_utils.py:163);
  * train loss = BCE(pos→1) + BCE(neg→0), Adam, per-epoch AP/AUC
    (epoch_utils.py:295-317).
"""
from __future__ import annotations

import functools
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.dataset import TemporalData
from ..data.dependency import dependency_aware_batch
from ..data.packer import DevicePack, Pack, PackerConfig, StreamPacker
from ..models.tgnn import TGNNConfig, bce_loss, init_tgnn, tgnn_forward
from ..utils.config import FrameworkConfig
from .evaluator import Evaluator, average_precision, roc_auc
from .negatives import FixedNegatives, NegLinkSamplerDest


class Engine:
    """Single-host engine for the flagship TGNN. The multi-chip variants
    live in parallel/ and reuse the same packs and model functions."""

    def __init__(self, data: TemporalData, config: FrameworkConfig,
                 jit: bool = True):
        self.data = data
        self.config = config
        tr = config.train
        self.model_cfg = TGNNConfig(
            edge_feat_dim=data.msg_dim,
            hidden_dim=config.gnn.dim_out,
            num_heads=config.gnn.att_head,
            num_layers=config.gnn.layer,
            message_mode=config.gnn.message_mode,
            feat_drop=(config.gnn.override_dropout
                       if config.gnn.override_dropout is not None
                       else tr.dropout),
            attn_drop=(config.gnn.override_dropout
                       if config.gnn.override_dropout is not None
                       else tr.att_dropout),
            compute_dtype=jnp.bfloat16 if tr.compute_dtype == "bfloat16"
            else jnp.float32,
        )
        self.packer = StreamPacker(data.num_nodes, PackerConfig(
            num_neighbors=config.sampling.num_neighbors,
            batch_size=tr.batch_size,
            max_intra_block=tr.max_intra_block,
            seed=tr.seed,
        ))
        key = jax.random.PRNGKey(tr.seed)
        self.params = init_tgnn(key, self.model_cfg)
        self.optimizer = optax.adam(tr.lr)
        self.opt_state = self.optimizer.init(self.params)
        # Frozen all-ones memory (reference model_utils.py:270-271); the
        # real mailbox memory model lives in models/tgn.py.
        self.memory = jnp.ones((data.num_nodes, config.gnn.dim_out),
                               jnp.float32)
        self.feats = jnp.asarray(data.msg)       # device-resident msg table
        self.evaluator = Evaluator(data.name)
        self.neg_sampler = NegLinkSamplerDest(data.unique_dst(), seed=tr.seed)
        self._rng = jax.random.PRNGKey(tr.seed + 1)
        self._step = 0
        self._rows: Dict[str, np.ndarray] = {
            "train": np.nonzero(data.train_mask)[0],
            "val": np.nonzero(data.val_mask)[0],
            "test": np.nonzero(data.test_mask)[0],
        }
        self._blocks: Dict[str, np.ndarray] = {}
        self._jit = jit
        self._train_step = self._build_train_step()
        self._eval_fwd = self._build_eval_forward()

    # ------------------------------------------------------------ builders
    def _build_train_step(self):
        model_cfg = self.model_cfg
        optimizer = self.optimizer

        def step(params, opt_state, memory, feats, pack, rng):
            def loss_fn(p):
                pos, neg = tgnn_forward(p, model_cfg, memory, feats, pack,
                                        train=True, rng=rng)
                return bce_loss(pos, neg, pack.ev_valid), (pos, neg)

            (loss, (pos, neg)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, pos, neg

        if self._jit:
            return jax.jit(step, donate_argnums=(0, 1))
        return step

    def _build_eval_forward(self):
        model_cfg = self.model_cfg

        def fwd(params, memory, feats, pack):
            return tgnn_forward(params, model_cfg, memory, feats, pack,
                                train=False)

        return jax.jit(fwd) if self._jit else fwd

    # ------------------------------------------------------------- batching
    def blocks_for(self, split: str) -> np.ndarray:
        """Dependency blocks per split, computed once (reference precomputes
        at utils.py:55-57 — minus its val/test swap bug, SURVEY.md §7.5)."""
        if split not in self._blocks:
            rows = self._rows[split]
            self._blocks[split] = dependency_aware_batch(
                self.data.src[rows], self.data.dst[rows],
                self.config.train.batch_size,
                num_threads=self.config.sampling.num_thread)
        return self._blocks[split]

    def _iter_batches(self, split: str):
        rows = self._rows[split]
        blocks = self.blocks_for(split)
        bs = self.config.train.batch_size
        for lo in range(0, len(rows), bs):
            hi = min(lo + bs, len(rows))
            yield lo, hi, rows[lo:hi], blocks[lo:hi]

    # --------------------------------------------------------------- epochs
    def train_epoch(self) -> Dict[str, float]:
        d = self.data
        self.packer.reset_cache()
        total_loss = 0.0
        total = 0
        aps, aucs = [], []
        for lo, hi, rows, blk in self._iter_batches("train"):
            src, dst, t = d.src[rows], d.dst[rows], d.t[rows]
            neg = self.neg_sampler.sample(dst)
            pack = self.packer.pack(src, dst, t, rows, blk, neg,
                                    eval_mode=False)
            self._rng, sk = jax.random.split(self._rng)
            dev = pack.device()
            self.params, self.opt_state, loss, pos, neg_out = \
                self._train_step(self.params, self.opt_state, self.memory,
                                 self.feats, dev, sk)
            n = hi - lo
            total_loss += float(loss) * n
            total += n
            pos_np = np.asarray(pos)[:n]
            neg_np = np.asarray(neg_out)[:n]
            y_score = 1.0 / (1.0 + np.exp(-np.concatenate([pos_np, neg_np])))
            y_true = np.concatenate([np.ones(n), np.zeros(n)])
            aps.append(average_precision(y_true, y_score))
            aucs.append(roc_auc(y_true, y_score))
            self._step += 1
        return {"loss": total_loss, "ap": float(np.mean(aps)),
                "auc": float(np.mean(aucs)), "events": total}

    def evaluate(self, split: str = "val") -> float:
        d = self.data
        ns = d.val_ns if split == "val" else d.test_ns
        if ns is None:
            raise ValueError(f"no fixed negatives for split '{split}'")
        fixed = FixedNegatives(ns, mode=self.config.train.eval_neg_mode)
        perf = []
        for lo, hi, rows, blk in self._iter_batches(split):
            src, dst, t = d.src[rows], d.dst[rows], d.t[rows]
            neg, _mask = fixed.query_batch(lo, hi)
            pack = self.packer.pack(src, dst, t, rows, blk, neg,
                                    eval_mode=True)
            pos, negs = self._eval_fwd(self.params, self.memory, self.feats,
                                       pack.device())
            n = hi - lo
            res = self.evaluator.eval({
                "y_pred_pos": np.asarray(pos)[:n],
                "y_pred_neg": np.asarray(negs)[:n],
                "eval_metric": [d.eval_metric],
            })
            perf.append(res[d.eval_metric])
        return float(np.mean(perf))

    def fit(self, epochs: Optional[int] = None, log=print,
            eval_every: int = 1) -> Dict[str, list]:
        """Epoch driver mirroring reference pyg-mem-tgn.py:53-67."""
        epochs = epochs or self.config.train.epoch
        history = {"loss": [], "val": [], "train_s": [], "val_s": []}
        start = time.time()
        for e in range(epochs):
            t0 = time.time()
            stats = self.train_epoch()
            t1 = time.time()
            log(f"Epoch: {e + 1:02d}, Loss: {stats['loss']:.4f}, "
                f"AP: {stats['ap']:.4f}, AUC: {stats['auc']:.4f}, "
                f"Training elapsed Time (s): {t1 - t0: .4f}")
            history["loss"].append(stats["loss"])
            history["train_s"].append(t1 - t0)
            if (e + 1) % eval_every == 0 and self.data.val_ns is not None:
                t0 = time.time()
                val = self.evaluate("val")
                t1 = time.time()
                log(f"Validation {self.data.eval_metric}: {val: .4f}, "
                    f"elapsed Time (s): {t1 - t0: .4f}")
                history["val"].append(val)
                history["val_s"].append(t1 - t0)
        log(f"Execution Time: {time.time() - start:.6f} seconds")
        return history
