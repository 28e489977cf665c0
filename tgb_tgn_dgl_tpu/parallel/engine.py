"""ShardedEngine — epoch-level multi-chip training/eval driver.

The reference is strictly single-process/single-GPU (SURVEY.md §2.4);
this driver is the framework's distribution capability at the EPOCH
level: the host packer streams batches exactly like engine/train.Engine
(same protocol: train-epoch cache reset, streaming eval, fixed-negative
MRR), while every device step runs jitted over a ("dp", "state") Mesh
(parallel/mesh.py):

  * wire arrays (events, root slots, grids, write plans) are
    range-partitioned over "dp" — intra-batch edge-stream data
    parallelism over the causally-resolved packed grid, so the temporal
    semantics are EXACTLY the single-chip ones (the grid already
    encodes block ordering; splitting its rows is embarrassingly
    parallel);
  * node state (memory, last_update, mailbox) and the msg/feature
    tables are row-sharded over "state";
  * parameters/optimizer are replicated; GSPMD inserts psum for
    gradients and all-gather/all-to-all for cross-shard node-row
    gathers and mailbox commits over ICI.

Numerics match the single-device Engine up to float reassociation
(tests/test_parallel.py::test_sharded_engine_matches_single); with a
real multi-chip slice this class is the drop-in scaling path
(bench_scaling.py sweeps its step over mesh shapes).
"""
from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.dataset import TemporalData
from ..data.dependency import dependency_aware_batch
from ..data.native_packer import make_stream_packer
from ..data.packer import PackerConfig
from ..models.memory import (MemoryModelConfig, MemoryState, apply_mail,
                             commit, init_memory_params, init_memory_state)
from ..models.tgnn import (TGNNConfig, bce_loss, edge_predictor, init_tgnn,
                           tgnn_embed, tgnn_forward)
from ..ops.wire import WirePack, expand_wire
from ..engine.evaluator import jnp_ap_auc
from ..engine.negatives import FixedNegatives, NegLinkSamplerDest
from ..utils.config import FrameworkConfig
from . import mesh as mesh_lib
from .sharded import _pad_leading, _pad_rows


class ShardedEngine:
    """Multi-chip epoch driver for the flagship TGNN (mailbox memory or
    the reference's frozen-memory variant).  Requires a fixed intra
    width (train.max_intra_block is not None) so the jit signature is
    stable across batches."""

    def __init__(self, data: TemporalData, config: FrameworkConfig,
                 mesh=None):
        from ..engine.train import _enable_persistent_compile_cache
        _enable_persistent_compile_cache()
        self.data = data
        self.config = config
        tr = config.train
        assert tr.max_intra_block is not None, (
            "ShardedEngine needs a fixed train.max_intra_block")
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh()
        self.model_cfg = TGNNConfig(
            edge_feat_dim=data.msg_dim,
            hidden_dim=config.gnn.dim_out,
            num_heads=config.gnn.att_head,
            num_layers=1,
            message_mode=config.gnn.message_mode,
            feat_drop=tr.dropout, attn_drop=tr.att_dropout,
            compute_dtype=jnp.bfloat16 if tr.compute_dtype == "bfloat16"
            else jnp.float32,
        )
        self.K = config.sampling.num_neighbors
        self.IW = tr.max_intra_block
        self.N = data.num_nodes
        pk_cfg = PackerConfig(
            num_neighbors=self.K, batch_size=tr.batch_size,
            max_intra_block=tr.max_intra_block,
            mailbox_size=config.memory.mailbox_size, seed=tr.seed)
        self.packer = make_stream_packer(data.num_nodes, pk_cfg)
        self.use_memory = config.memory.enabled and not tr.frozen_memory
        key = jax.random.PRNGKey(tr.seed)
        k_model, k_mem = jax.random.split(key)
        self.params = init_tgnn(k_model, self.model_cfg)
        if self.use_memory:
            assert config.memory.dim_out == config.gnn.dim_out
            self.mem_cfg = MemoryModelConfig(
                num_nodes=data.num_nodes, raw_msg_dim=data.msg_dim,
                memory_dim=config.memory.dim_out,
                time_dim=config.memory.dim_time,
                mailbox_size=config.memory.mailbox_size,
                updater=config.memory.memory_update,
                combine=config.memory.mail_combine)
            self.params["memory"] = init_memory_params(k_mem, self.mem_cfg)
            self.mem_state = init_memory_state(self.mem_cfg)
        else:
            self.mem_cfg = None
            self.mem_state = None
        self.optimizer = optax.adam(tr.lr)
        self.opt_state = self.optimizer.init(self.params)
        self.memory_frozen = jnp.ones((data.num_nodes, config.gnn.dim_out),
                                      jnp.float32)
        self.feats = np.asarray(data.msg)
        self.neg_sampler = NegLinkSamplerDest(data.unique_dst(),
                                              seed=tr.seed)
        self._rng = jax.random.key(tr.seed + 1, impl=tr.rng_impl)
        self._rows = {
            "train": np.nonzero(data.train_mask)[0],
            "val": np.nonzero(data.val_mask)[0],
            "test": np.nonzero(data.test_mask)[0],
        }
        self._blocks: Dict[str, np.ndarray] = {}
        self._placed = False
        self._build_steps()

    # ------------------------------------------------------------ sharding
    def _shardings(self):
        m = self.mesh
        return {
            "wire": mesh_lib.wire_shardings(m),
            "state": mesh_lib.state_sharding(m),
            "row": mesh_lib.row_sharding(m),
            "rep": mesh_lib.replicated(m),
        }

    def _mem_sharding(self):
        sh = self._shardings()
        return MemoryState(
            mem=sh["state"], last_update=sh["row"],
            mail_src=sh["state"], mail_dst=sh["state"], mail_t=sh["state"],
            mail_eid=sh["state"], mail_valid=sh["state"])

    def _build_steps(self):
        sh = self._shardings()
        rep, state_sh, wire_sh = sh["rep"], sh["state"], sh["wire"]
        mem_sh = self._mem_sharding() if self.use_memory else state_sh
        model_cfg, optimizer = self.model_cfg, self.optimizer
        K, IW, N = self.K, self.IW, self.N
        use_memory = self.use_memory
        mem_cfg = self.mem_cfg

        def metrics(acc, loss, pos, neg, valid):
            n = valid.sum()
            neg1 = neg if neg.ndim == 1 else neg[:, 0]
            ap, auc = jnp_ap_auc(jax.nn.sigmoid(pos),
                                 jax.nn.sigmoid(neg1), valid)
            return acc + jnp.stack([loss.astype(jnp.float32) * n, ap, auc,
                                    jnp.float32(1.0)])

        if use_memory:
            def step(params, opt_state, mem_state, feats, wire, rng, acc):
                pack = expand_wire(wire, K, IW, N)

                def loss_fn(p):
                    mem_rows, lu_rows = apply_mail(
                        p["memory"], mem_cfg, mem_state, pack.uniq_nid,
                        feats)
                    pos, neg = tgnn_forward(p, model_cfg, mem_rows, feats,
                                            pack, train=True, rng=rng,
                                            local=True)
                    return (bce_loss(pos, neg, pack.ev_valid),
                            (pos, neg, mem_rows, lu_rows))

                (loss, (pos, neg, mem_rows, lu_rows)), grads = \
                    jax.value_and_grad(loss_fn, has_aux=True)(params)
                mem_state = commit(mem_cfg, mem_state, pack.uniq_nid,
                                   mem_rows, lu_rows, pack.mw_node,
                                   pack.mw_slot, pack.mw_partner,
                                   pack.mw_t, pack.mw_eid)
                updates, opt_state = optimizer.update(grads, opt_state,
                                                      params)
                params = optax.apply_updates(params, updates)
                acc = metrics(acc, loss, pos, neg, pack.ev_valid)
                return params, opt_state, mem_state, acc, loss

            self._train_step = jax.jit(
                step,
                in_shardings=(rep, rep, mem_sh, state_sh, wire_sh, rep,
                              rep),
                out_shardings=(rep, rep, mem_sh, rep, rep),
                donate_argnums=(0, 1, 2, 6))

            def efwd(params, mem_state, feats, wire):
                pack = expand_wire(wire, K, IW, N)
                mem_rows, lu_rows = apply_mail(params["memory"], mem_cfg,
                                               mem_state, pack.uniq_nid,
                                               feats)
                embed = tgnn_embed(params, model_cfg, mem_rows, feats,
                                   pack, train=False, local=True)
                mem_state = commit(mem_cfg, mem_state, pack.uniq_nid,
                                   mem_rows, lu_rows, pack.mw_node,
                                   pack.mw_slot, pack.mw_partner,
                                   pack.mw_t, pack.mw_eid)
                return embed, mem_state

            self._eval_fwd = jax.jit(
                efwd,
                in_shardings=(rep, mem_sh, state_sh, wire_sh),
                out_shardings=(sh["row"], mem_sh),
                donate_argnums=(1,))
        else:
            def step(params, opt_state, memory, feats, wire, rng, acc):
                pack = expand_wire(wire, K, IW, N)

                def loss_fn(p):
                    pos, neg = tgnn_forward(p, model_cfg, memory, feats,
                                            pack, train=True, rng=rng)
                    return bce_loss(pos, neg, pack.ev_valid), (pos, neg)

                (loss, (pos, neg)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                updates, opt_state = optimizer.update(grads, opt_state,
                                                      params)
                params = optax.apply_updates(params, updates)
                acc = metrics(acc, loss, pos, neg, pack.ev_valid)
                return params, opt_state, acc, loss

            self._train_step = jax.jit(
                step,
                in_shardings=(rep, rep, state_sh, state_sh, wire_sh, rep,
                              rep),
                out_shardings=(rep, rep, rep, rep),
                donate_argnums=(0, 1, 6))

            def efwd(params, memory, feats, wire):
                pack = expand_wire(wire, K, IW, N)
                return tgnn_embed(params, model_cfg, memory, feats, pack,
                                  train=False)

            self._eval_fwd = jax.jit(
                efwd,
                in_shardings=(rep, state_sh, state_sh, wire_sh),
                out_shardings=sh["row"])

        def score(params, embed, wire, opt, pes):
            h_src = embed[wire.ev_src_slot]
            h_pos = embed[wire.ev_pos_slot]
            h_neg = embed[wire.ev_neg_slot]
            pos, neg = edge_predictor(params["pred"], h_src, h_pos, h_neg)
            neg2 = neg if neg.ndim == 2 else neg[:, None]
            p = pos[:, None]
            return (opt + (neg2 > p).sum(axis=1),
                    pes + (neg2 >= p).sum(axis=1))

        self._eval_score = jax.jit(
            score, in_shardings=(rep, sh["row"], wire_sh, rep, rep),
            out_shardings=(rep, rep), donate_argnums=(3, 4))

    # ------------------------------------------------------------ plumbing
    def _place_state(self):
        """One-time device placement of the big tables with their
        shardings (replicated params, row-sharded state)."""
        if self._placed:
            return
        sh = self._shardings()
        st_n = self.mesh.shape["state"]
        self.feats = jax.device_put(_pad_rows(self.feats, st_n),
                                    sh["state"])
        self.params = jax.device_put(self.params, sh["rep"])
        self.opt_state = jax.device_put(self.opt_state, sh["rep"])
        if self.use_memory:
            mem_sh = self._mem_sharding()
            self.mem_state = MemoryState(*[
                jax.device_put(_pad_rows(a, st_n), s)
                for a, s in zip(self.mem_state, mem_sh)])
        else:
            self.memory_frozen = jax.device_put(
                _pad_rows(self.memory_frozen, st_n), sh["state"])
        self._placed = True

    def _place_wire(self, wire: WirePack):
        dp_n = self.mesh.shape["dp"]
        sh = self._shardings()["wire"]
        wire = WirePack(*[(None if a is None
                           else _pad_leading(np.asarray(a), dp_n))
                          for a in wire])
        return jax.tree.map(lambda a, s: jax.device_put(a, s), wire, sh,
                            is_leaf=lambda x: x is None)

    def blocks_for(self, split: str) -> np.ndarray:
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

    # -------------------------------------------------------------- epochs
    def train_epoch(self) -> Dict[str, float]:
        self._place_state()
        d = self.data
        self.packer.reset_cache()
        if self.use_memory:
            st_n = self.mesh.shape["state"]
            mem_sh = self._mem_sharding()
            self.mem_state = MemoryState(*[
                jax.device_put(_pad_rows(a, st_n), s)
                for a, s in zip(init_memory_state(self.mem_cfg), mem_sh)])
        acc = jax.device_put(jnp.zeros(4, jnp.float32),
                             self._shardings()["rep"])
        total = 0
        for lo, hi, rows, blk in self._iter_batches("train"):
            src, dst, t = d.src[rows], d.dst[rows], d.t[rows]
            neg = self.neg_sampler.sample(dst)
            wire, _iw = self.packer.pack_wire(src, dst, t, rows, blk, neg)
            wire = self._place_wire(wire)
            self._rng, sk = jax.random.split(self._rng)
            if self.use_memory:
                (self.params, self.opt_state, self.mem_state, acc,
                 _loss) = self._train_step(self.params, self.opt_state,
                                           self.mem_state, self.feats,
                                           wire, sk, acc)
            else:
                self.params, self.opt_state, acc, _loss = \
                    self._train_step(self.params, self.opt_state,
                                     self.memory_frozen, self.feats, wire,
                                     sk, acc)
            total += hi - lo
        vals = np.asarray(acc)
        nb = max(vals[3], 1.0)
        return {"loss": float(vals[0]), "ap": float(vals[1] / nb),
                "auc": float(vals[2] / nb), "events": total}

    def evaluate(self, split: str = "val") -> float:
        self._place_state()
        d = self.data
        ns = d.val_ns if split == "val" else d.test_ns
        if ns is None:
            raise ValueError(f"no fixed negatives for split '{split}'")
        fixed = FixedNegatives(ns, mode=self.config.train.eval_neg_mode)
        B = self.config.train.batch_size
        rep = self._shardings()["rep"]
        rrs = []
        for lo, hi, rows, blk in self._iter_batches(split):
            src, dst, t = d.src[rows], d.dst[rows], d.t[rows]
            neg, _mask = fixed.query_batch(lo, hi)
            neg = np.asarray(neg).reshape(len(rows), -1)
            M = neg.shape[1]
            Mc = (self.config.train.eval_neg_chunk
                  or max(1, min(M, 49152 // max(hi - lo, 1) - 2)))
            n_chunks = -(-M // Mc)
            opt = jax.device_put(jnp.zeros(B, jnp.int32), rep)
            pes = jax.device_put(jnp.zeros(B, jnp.int32), rep)
            for ci in range(n_chunks):
                last = ci == n_chunks - 1
                neg_c = neg[:, ci * Mc:(ci + 1) * Mc]
                wire, _iw = self.packer.pack_wire(
                    src, dst, t, rows, blk, neg_c, eval_mode=True,
                    insert=last, write_mail=last)
                wire = self._place_wire(wire)
                if self.use_memory:
                    embed, self.mem_state = self._eval_fwd(
                        self.params, self.mem_state, self.feats, wire)
                else:
                    embed = self._eval_fwd(self.params,
                                           self.memory_frozen,
                                           self.feats, wire)
                opt, pes = self._eval_score(self.params, embed, wire,
                                            opt, pes)
            rank = 0.5 * (np.asarray(opt) + np.asarray(pes)) + 1.0
            rr = 1.0 / rank[:hi - lo]
            rrs.append(rr.mean())
        return float(np.mean(rrs))

    def fit(self, epochs: int, log=print) -> Dict[str, list]:
        history = {"loss": [], "val": []}
        for e in range(epochs):
            t0 = time.time()
            stats = self.train_epoch()
            log(f"[sharded {dict(self.mesh.shape)}] Epoch: {e + 1:02d}, "
                f"Loss: {stats['loss']:.4f}, AP: {stats['ap']:.4f}, "
                f"AUC: {stats['auc']:.4f}, "
                f"Time (s): {time.time() - t0:.4f}")
            history["loss"].append(stats["loss"])
            if self.data.val_ns is not None:
                val = self.evaluate("val")
                log(f"[sharded] Validation mrr: {val:.4f}")
                history["val"].append(val)
        return history
