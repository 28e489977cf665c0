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
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.dataset import TemporalData
from ..data.dependency import dependency_aware_batch
from ..data.native_packer import make_stream_packer
from ..data.packer import DevicePack, Pack, PackerConfig, StreamPacker
from ..models.factory import arch_embed, arch_predict, init_arch_params
from ..models.init import derive_key
from ..models.memory import (MemoryModelConfig, apply_mail, commit,
                             init_memory_params, init_memory_state)
from ..models.tgnn import (TGNNConfig, bce_loss, init_tgnn, tgnn_embed,
                           tgnn_forward)
from ..models.variants import (EagerMemoryConfig, dyrep_messages,
                               eager_apply_mail, eager_commit,
                               init_eager_memory_params,
                               init_eager_memory_state)
from ..ops.wire import (BlobWire, DedupWire, blob_stack, compact_wire,
                        eval_lean_dedup, expand_any, expand_wire,
                        nb_bucket_of, pack_to_wire, stack_wires,
                        train_lean_dedup, unblob_one)
from ..utils.config import FrameworkConfig
from .checkpoint import (EarlyStopMonitor, load_pytree, rng_state_from_array,
                         rng_state_to_array, save_pytree)
from .evaluator import (Evaluator, average_precision, jnp_ap_auc, jnp_mrr,
                        parse_eval_metric, rank_metric_from_counts, roc_auc)
from .negatives import FixedNegatives, NegLinkSamplerDest


def _enable_persistent_compile_cache() -> None:
    """XLA compiles cost 20-40 s each on tunneled TPU backends; the
    persistent cache makes them one-time per (program, shape bucket)
    across processes."""
    import os

    try:
        if not jax.config.jax_compilation_cache_dir:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ.get("TGB_TGN_JAX_CACHE",
                               os.path.expanduser("~/.cache/tgb_tgn_jax")))
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
    except Exception:
        pass


# TGB_TGN_EPOCH_TRACE=1: print a per-epoch phase breakdown (host packing
# vs backpressure waits vs end-of-epoch drain) — SURVEY.md §5.1 tracing.
_EPOCH_TRACE = os.environ.get("TGB_TGN_EPOCH_TRACE", "") not in ("", "0")


class EpochStats:
    """Lazy per-epoch training stats (mapping: loss/ap/auc/events).

    The on-device (4,) metric accumulator starts its D2H copy
    asynchronously at construction and materializes on first key access.
    A driver that reads the stats immediately (Engine.fit's per-epoch log
    line) blocks exactly like the old eager dict did; a driver that reads
    them one epoch later (steady-state benchmarking, pipelined loggers)
    overlaps the ~0.5 s tunneled D2H round-trip with the next epoch's
    packing instead of adding it to every epoch's critical path."""

    def __init__(self, acc, events: int):
        self._acc = acc
        self._events = events
        self._vals = None
        try:
            acc.copy_to_host_async()
        except Exception:
            pass    # purely an optimization hint; sharded/odd backends
                    # may raise RuntimeError instead of AttributeError

    def _resolve(self):
        if self._vals is None:
            vals = np.asarray(self._acc)                 # ONE fetch
            nb = max(vals[3], 1.0)
            self._vals = {"loss": float(vals[0]),
                          "ap": float(vals[1] / nb),
                          "auc": float(vals[2] / nb),
                          "events": self._events}
            self._acc = None
        return self._vals

    def __getitem__(self, k):
        if k == "events":
            return self._events
        return self._resolve()[k]

    def __contains__(self, k):
        return k in ("loss", "ap", "auc", "events")

    def keys(self):
        return ("loss", "ap", "auc", "events")

    def __repr__(self):
        return repr(self._resolve())


def eval_neg_chunk_size(config, M: int, n_events: int) -> int:
    """Negatives per eval chunk: root slots scale with B*(2+Mc), so cap
    ~24K root slots per chunk (TrainConfig.eval_neg_chunk overrides).
    ONE definition shared by Engine.evaluate, Engine.warm_buckets and
    ShardedEngine.evaluate — the eval-bucket pre-warm only prevents
    mid-eval XLA compiles if its chunking matches evaluate's exactly.
    """
    return (config.train.eval_neg_chunk
            or max(1, min(M, 49152 // max(n_events, 1) - 2)))


def _wire_key(iw, wire):
    """Fuse-group signature: same-shape AND same-dtype wires share one
    compiled bucket (compact-wire dtypes can widen when a sticky bucket
    crosses a uint16 range)."""
    return (iw,) + tuple(
        (None if a is None else (np.shape(a), np.asarray(a).dtype.str))
        for a in wire)


class Engine:
    """Single-host engine for the flagship TGNN. The multi-chip variants
    live in parallel/ and reuse the same packs and model functions."""

    def __init__(self, data: TemporalData, config: FrameworkConfig,
                 jit: bool = True):
        _enable_persistent_compile_cache()
        self.data = data
        self.config = config.validate()
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
            use_pallas=config.gnn.use_pallas,
        )
        pk_cfg = PackerConfig(
            num_neighbors=config.sampling.num_neighbors,
            batch_size=tr.batch_size,
            max_intra_block=tr.max_intra_block,
            mailbox_size=config.memory.mailbox_size,
            strategy=config.sampling.strategy,
            seed=tr.seed,
            layers=config.gnn.layer,
        )
        # Device-cache mode (ops/lean_wire.py): streaming state lives on
        # device; the host ships a lean event-only wire.
        self.device_cache = (
            tr.device_cache
            and config.gnn.arch == "transformer_attention"
            and config.gnn.layer == 1
            and config.sampling.strategy == "recent")
        if self.device_cache:
            from ..data.lean_packer import make_lean_packer
            from ..ops.lean_wire import init_stream_device_state
            self.packer = make_lean_packer(data.num_nodes, pk_cfg)
            self.sstate = init_stream_device_state(
                data.num_nodes, config.sampling.num_neighbors)
        else:
            self.packer = make_stream_packer(data.num_nodes, pk_cfg)
            self.sstate = None
        if config.sampling.strategy == "uniform":
            from ..data.tcsr import build_tcsr
            self.packer.set_tcsr(build_tcsr(data.src, data.dst, data.t,
                                            data.num_nodes))
        # Narrow-dtype wire (ops/wire.CompactWire): ~1.5× fewer H2D bytes,
        # bit-exact.  The lean packer has its own (already minimal) wire.
        self._wire_compact = bool(tr.wire_compact) and not self.device_cache
        # Deduplicated device-derived wire (ops/wire.DedupWire): ~3.5×
        # fewer H2D bytes, bit-exact; per-batch fallback to the compact
        # wire when not representable.
        self._wire_dedup = (bool(tr.wire_dedup) and not self.device_cache
                            and config.sampling.strategy == "recent"
                            and config.gnn.layer == 1)
        # Fused groups ship as 3 blob arrays (ops/wire.BlobWire): the
        # tunneled H2D path charges a large fixed cost PER ARRAY.
        self._wire_blob = bool(tr.wire_blob) and not self.device_cache
        # Train-lean wire (ops/wire.train_lean_dedup): TRAIN dedup wires
        # drop their Δt fields; the device re-derives them from the time
        # table + pre-batch clock rows (bit-exact).
        self._train_lean = bool(tr.wire_train_lean) and self._wire_dedup
        self._rslot = config.gnn.layer > 1
        # Arch selection (gnn.arch knob): 'transformer_attention' (TGNN),
        # 'identity' (JODIE), 'dyrep' (models/factory.py).  JODIE/DyRep
        # are memory-based by definition; the flagship uses the real
        # mailbox memory unless the reference's frozen-all-ones quirk is
        # requested (model_utils.py:270-271) or memory.type == 'none'.
        self.arch = config.gnn.arch
        if self.arch in ("identity", "dyrep"):
            assert config.memory.enabled, f"arch '{self.arch}' needs memory"
            self.use_memory = True
        else:
            self.use_memory = config.memory.enabled and not tr.frozen_memory
        if not self.use_memory:
            # reference-parity frozen path: memory ≡ ones forever, so the
            # embedding can skip the memory gathers (TGNNConfig docstring)
            self.model_cfg = self.model_cfg._replace(const_ones_memory=True)
        # DyRep messages embed the event partner -> eager mail storage
        self.eager_memory = self.arch == "dyrep"
        key = jax.random.PRNGKey(tr.seed)
        k_model, k_mem = jax.random.split(key)
        self.params = init_arch_params(k_model, self.arch, self.model_cfg)
        if self.use_memory:
            assert config.memory.dim_out == config.gnn.dim_out, (
                "memory.dim_out must equal gnn.dim_out (the embedding "
                "reads memory rows as node features)")
            if self.eager_memory:
                D = config.memory.dim_out
                # mail = cat(self, partner, raw, Δt-enc) — reference
                # IdentityMessage width (modules/msg_func.py:15)
                self.mem_cfg = EagerMemoryConfig(
                    num_nodes=data.num_nodes,
                    mail_dim=2 * D + data.msg_dim + D,
                    memory_dim=D,
                    updater=config.memory.memory_update,
                    combine=config.memory.mail_combine,
                    use_src_emb=config.memory.use_src_emb_in_msg,
                    use_dst_emb=config.memory.use_dst_emb_in_msg,
                )
                self.params["memory"] = init_eager_memory_params(
                    k_mem, self.mem_cfg)
                self.mem_state = init_eager_memory_state(
                    self.mem_cfg, config.memory.mailbox_size)
            else:
                self.mem_cfg = MemoryModelConfig(
                    num_nodes=data.num_nodes,
                    raw_msg_dim=data.msg_dim,
                    memory_dim=config.memory.dim_out,
                    time_dim=config.memory.dim_time,
                    mailbox_size=config.memory.mailbox_size,
                    updater=config.memory.memory_update,
                    combine=config.memory.mail_combine,
                )
                self.params["memory"] = init_memory_params(k_mem,
                                                           self.mem_cfg)
                self.mem_state = init_memory_state(self.mem_cfg)
        else:
            self.mem_cfg = None
            self.mem_state = None
        # (optax.flatten was A/B'd for kernel-count reduction: no change —
        # XLA already fuses the per-leaf Adam updates; see BASELINE.md)
        self.optimizer = optax.adam(tr.lr)
        self.opt_state = self.optimizer.init(self.params)
        # Frozen all-ones memory table for the reference-parity path
        # (reference model_utils.py:270-271).
        self.memory = jnp.ones((data.num_nodes, config.gnn.dim_out),
                               jnp.float32)
        self.feats = jnp.asarray(data.msg)       # device-resident msg table
        # Device-resident global event-time table: static per dataset, the
        # DedupWire derives cache timestamps as t = times[e_id] instead of
        # shipping them (the packer's cache_t holds exactly these float32
        # values — StreamPacker.insert stores the batch's f32 t column).
        self.times = jnp.asarray(np.asarray(data.t, np.float32))
        self._tables = (self.feats, self.times)
        self.evaluator = Evaluator(data.name)
        self.neg_sampler = NegLinkSamplerDest(data.unique_dst(), seed=tr.seed)
        # Per-step training keys (dropout): typed key with the configured
        # impl ('rbg' = TPU hardware RNG; see TrainConfig.rng_impl).
        self._rng_impl = tr.rng_impl
        # Host-side key schedule: per-step keys are derived in NUMPY as
        # base_key_data + 64·step·C (models/init.derive_key contract) —
        # no per-batch jax.random.split (each split was a tiny tunneled
        # device dispatch AND a ~60-instruction threefry chain inside the
        # fused program).  Fused groups receive the key of their FIRST
        # step and derive member i's key as +64·i, so fused and
        # per-batch dispatch produce identical streams.
        # The base key itself is created on the CPU backend: deriving it
        # on the accelerator would make __init__ pay one D2H round-trip
        # (~0.5 s on tunneled runtimes) just to read 16 bytes.
        try:
            cpu0 = jax.local_devices(backend="cpu")[0]
            with jax.default_device(cpu0):
                host_key = jax.random.key(tr.seed + 1, impl=tr.rng_impl)
                self._base_kd = np.asarray(jax.random.key_data(host_key))
        except RuntimeError:    # no separate cpu backend registered
            host_key = jax.random.key(tr.seed + 1, impl=tr.rng_impl)
            self._base_kd = np.asarray(jax.random.key_data(host_key))
        self._rng = jax.random.wrap_key_data(jnp.asarray(self._base_kd),
                                             impl=tr.rng_impl)
        self._rng_step = 0
        self._step = 0
        self._epoch = 0   # completed-epoch cursor (checkpoint/resume)
        self._rows: Dict[str, np.ndarray] = {
            "train": np.nonzero(data.train_mask)[0],
            "val": np.nonzero(data.val_mask)[0],
            "test": np.nonzero(data.test_mask)[0],
        }
        self._blocks: Dict[str, np.ndarray] = {}
        self._jit = jit
        # device dispatches issued (train steps, eval fwd/score/finalize)
        # — the binding cost on remote backends (BASELINE.md perf model)
        self.dispatch_count = 0
        self._rebuild_steps()
        self._builders_ready = True

    def _rebuild_steps(self) -> None:
        tr = self.config.train
        self._train_step = self._build_train_step()
        self._fused_train_step = (self._build_fused_train_step()
                                  if tr.fuse_steps > 1 else None)
        self._eval_fwd = self._build_eval_forward()
        self._fused_eval_step = (self._build_fused_eval_step()
                                 if tr.fuse_steps > 1 else None)

    @property
    def memory(self):
        """Frozen node-memory table (reference all-ones quirk,
        model_utils.py:270-271).  Assigning a custom table (tests/
        ablations do) drops the const-ones embedding fast path and
        rebuilds the jitted steps so the table is actually read."""
        return self._frozen_memory

    @memory.setter
    def memory(self, value):
        self._frozen_memory = value
        if getattr(self, "_builders_ready", False) and \
                self.model_cfg.const_ones_memory:
            self.model_cfg = self.model_cfg._replace(
                const_ones_memory=False)
            self._rebuild_steps()

    # ------------------------------------------------------------ builders
    # The device steps take a compact WirePack and rebuild the padded
    # grids on device (ops/wire.py) — host→device traffic is the wall
    # once the packer is native.  intra_width is static per shape bucket.
    def _build_train_step(self):
        if self.device_cache:
            return self._build_lean_train_step()
        model_cfg = self.model_cfg
        optimizer = self.optimizer
        K = self.config.sampling.num_neighbors
        N = self.data.num_nodes

        arch = self.arch

        def train_metrics(acc, loss, pos, neg, valid):
            """Running on-device epoch accumulator (4,): [Σ loss·n, Σ ap,
            Σ auc, batches] — D2H fetches are ~0.5 s each on tunneled
            backends, so per-batch host reads are forbidden; the engine
            fetches this ONCE per epoch."""
            n = valid.sum()
            neg1 = neg if neg.ndim == 1 else neg[:, 0]
            ap, auc = jnp_ap_auc(jax.nn.sigmoid(pos),
                                 jax.nn.sigmoid(neg1), valid)
            return acc + jnp.stack([loss.astype(jnp.float32) * n, ap, auc,
                                    jnp.float32(1.0)])

        rslot = self._rslot

        def make_embed_fn():
            """Embed closure for the memory-mode steps; train.remat
            wraps it in jax.checkpoint so the (R, Kp, ·) grid residuals
            are recomputed during backward rather than saved.  Bit-exact
            (same program, same values — only the autodiff schedule
            changes)."""
            def embed_fn(p, mem_rows, lu_rows, feats, pack, rng):
                return arch_embed(p, arch, model_cfg, mem_rows, lu_rows,
                                  feats, pack, train=True, rng=rng,
                                  local=True)
            if self.config.train.remat:
                return jax.checkpoint(embed_fn)
            return embed_fn

        if self.use_memory and self.eager_memory:       # DyRep
            mem_cfg = self.mem_cfg
            embed_fn = make_embed_fn()

            def step(params, opt_state, mem_state, tables, wire, rng, acc,
                     intra_width):
                feats, times = tables
                pack = expand_any(wire, K, intra_width, N, times,
                                  eval_mode=False, with_rslot=rslot)

                def loss_fn(p):
                    mem_rows, lu_rows = eager_apply_mail(
                        p["memory"], mem_cfg, mem_state, pack.uniq_nid)
                    embed = embed_fn(p, mem_rows, lu_rows, feats, pack,
                                     rng)
                    pos, neg = arch_predict(p, embed, pack)
                    return (bce_loss(pos, neg, pack.ev_valid),
                            (pos, neg, mem_rows, lu_rows, embed))

                (loss, (pos, neg, mem_rows, lu_rows, embed)), grads = \
                    jax.value_and_grad(loss_fn, has_aux=True)(params)
                mw_mail = dyrep_messages(mem_cfg, embed, pack, feats,
                                         params["time"], mem_rows, lu_rows)
                mem_state = eager_commit(mem_cfg, mem_state, pack.uniq_nid,
                                         mem_rows, lu_rows, pack.mw_node,
                                         pack.mw_slot, mw_mail, pack.mw_t,
                                         pack.mw_eid)
                updates, opt_state = optimizer.update(grads, opt_state,
                                                      params)
                params = optax.apply_updates(params, updates)
                acc = train_metrics(acc, loss, pos, neg, pack.ev_valid)
                return params, opt_state, mem_state, loss, pos, neg, acc

            self._train_step_raw = step
            if self._jit:
                return jax.jit(step, donate_argnums=(0, 1, 2, 6),
                               static_argnums=(7,))
            return step

        if self.use_memory:                              # TGN / JODIE
            mem_cfg = self.mem_cfg
            embed_fn = make_embed_fn()

            def step(params, opt_state, mem_state, tables, wire, rng, acc,
                     intra_width):
                feats, times = tables
                pack = expand_any(wire, K, intra_width, N, times,
                                  eval_mode=False, with_rslot=rslot)

                def loss_fn(p):
                    mem_rows, lu_rows = apply_mail(
                        p["memory"], mem_cfg, mem_state, pack.uniq_nid,
                        feats)
                    embed = embed_fn(p, mem_rows, lu_rows, feats, pack,
                                     rng)
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
                acc = train_metrics(acc, loss, pos, neg, pack.ev_valid)
                return params, opt_state, mem_state, loss, pos, neg, acc

            self._train_step_raw = step
            if self._jit:
                return jax.jit(step, donate_argnums=(0, 1, 2, 6),
                               static_argnums=(7,))
            return step

        def step(params, opt_state, memory, tables, wire, rng, acc,
                 intra_width):
            feats, times = tables
            pack = expand_any(wire, K, intra_width, N, times,
                              eval_mode=False, with_rslot=rslot)

            def loss_fn(p):
                pos, neg = tgnn_forward(p, model_cfg, memory, feats, pack,
                                        train=True, rng=rng)
                return bce_loss(pos, neg, pack.ev_valid), (pos, neg)

            (loss, (pos, neg)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            acc = train_metrics(acc, loss, pos, neg, pack.ev_valid)
            return params, opt_state, loss, pos, neg, acc

        self._train_step_raw = step
        if self._jit:
            return jax.jit(step, donate_argnums=(0, 1, 6),
                           static_argnums=(7,))
        return step

    def _build_fused_train_step(self):
        """G same-shape batches in ONE dispatch: lax.scan of the per-batch
        step body over stacked WirePacks.  Remote dispatch latency (up to
        ~0.4 s/call on tunneled backends) makes per-batch dispatch the
        epoch wall; the scanned program is byte-identical math to the
        per-batch step (tests/test_engine.py::test_fused_steps_exact)."""
        if self.device_cache:
            return self._build_lean_fused_train_step()
        body = self._train_step_raw
        # fuse_unroll auto (None): unroll exactly when the step carries
        # memory state — the scan double-buffers the mailbox scatter
        # chain (BASELINE.md round-5 census: 559 kernels/batch scanned
        # vs 274 frozen; unroll measured +8.5% on the memory arm,
        # parity on frozen)
        unroll = self.config.train.fuse_unroll
        if unroll is None:
            unroll = self.use_memory

        # ``wires`` is either a stacked wire NamedTuple (leading G) or a
        # BlobWire (train.wire_blob); ``statics`` is intra_width alone or
        # (intra_width, blob layout).  expand_any extracts intra_width
        # from either form, so the body takes ``statics`` verbatim.
        def group_view(wires, statics):
            if isinstance(wires, BlobWire):
                _, layout = statics
                G = wires.b32.shape[0]
                return G, (lambda i: unblob_one(wires.b32[i], wires.b16[i],
                                                wires.b8[i], layout))
            G = wires[0].shape[0] if wires[0] is not None \
                else wires.ev_src.shape[0]
            return G, (lambda i: jax.tree.map(lambda a: a[i], wires))

        def scan_view(wires, statics):
            """(xs, per-iteration wire constructor) for lax.scan."""
            if isinstance(wires, BlobWire):
                _, layout = statics
                return wires, (lambda xs: unblob_one(xs.b32, xs.b16,
                                                     xs.b8, layout))
            return wires, (lambda xs: xs)

        if self.use_memory:
            def fused(params, opt_state, mem_state, tables, wires, rng, acc,
                      intra_width):
                if unroll:
                    # Straight-line code: inside a lax.scan (= XLA while
                    # loop) the broadcast-cos/gather chains refuse to fuse
                    # into the attention matmuls and (R, Kp, D)
                    # intermediates materialize per iteration (same
                    # pathology as _build_lean_fused_train_step).  G is
                    # static, so a Python loop over the stacked wire emits
                    # one big fusable program.
                    loss = None
                    G, getw = group_view(wires, intra_width)
                    for i in range(G):
                        wire = getw(i)
                        sk = derive_key(rng, 64 * i)
                        (params, opt_state, mem_state, loss, _p, _n,
                         acc) = body(params, opt_state, mem_state, tables,
                                     wire, sk, acc, intra_width)
                    return params, opt_state, mem_state, acc, loss

                xs_w, mkwire = scan_view(wires, intra_width)
                G, _ = group_view(wires, intra_width)

                def scan_body(carry, xs):
                    wx, idx = xs
                    wire = mkwire(wx)
                    params, opt_state, mem_state, acc = carry
                    sk = derive_key(rng, 64 * idx)
                    params, opt_state, mem_state, loss, _p, _n, acc = body(
                        params, opt_state, mem_state, tables, wire, sk, acc,
                        intra_width)
                    return (params, opt_state, mem_state, acc), loss

                (params, opt_state, mem_state, acc), losses = \
                    jax.lax.scan(
                        scan_body, (params, opt_state, mem_state, acc),
                        (xs_w, jnp.arange(G)))
                # losses[-1] is the (undonated) completion handle
                return params, opt_state, mem_state, acc, losses[-1]

            if self._jit:
                return jax.jit(fused, donate_argnums=(0, 1, 2, 6),
                               static_argnums=(7,))
            return fused

        def fused(params, opt_state, memory, tables, wires, rng, acc,
                  intra_width):
            if unroll:
                loss = None
                G, getw = group_view(wires, intra_width)
                for i in range(G):
                    wire = getw(i)
                    sk = derive_key(rng, 64 * i)
                    params, opt_state, loss, _p, _n, acc = body(
                        params, opt_state, memory, tables, wire, sk, acc,
                        intra_width)
                return params, opt_state, acc, loss

            xs_w, mkwire = scan_view(wires, intra_width)
            G, _ = group_view(wires, intra_width)

            def scan_body(carry, xs):
                wx, idx = xs
                wire = mkwire(wx)
                params, opt_state, acc = carry
                sk = derive_key(rng, 64 * idx)
                params, opt_state, loss, _p, _n, acc = body(
                    params, opt_state, memory, tables, wire, sk, acc,
                    intra_width)
                return (params, opt_state, acc), loss

            (params, opt_state, acc), losses = jax.lax.scan(
                scan_body, (params, opt_state, acc),
                (xs_w, jnp.arange(G)))
            return params, opt_state, acc, losses[-1]

        if self._jit:
            return jax.jit(fused, donate_argnums=(0, 1, 6),
                           static_argnums=(7,))
        return fused

    def _setup_eval_scoring(self):
        """Shared eval phases: edge scoring into per-event rank counts +
        the per-batch MRR finalizer (TGB/OGB tie convention)."""
        def score_counts(params, embed, wire, opt, pes, neg_mask):
            """neg_mask: None (all negatives real) or a (B, Mc) bool host
            array marking which negative columns are real — the pad+mask
            ragged-negative mode (train.eval_neg_mode='pad_mask',
            SURVEY.md §7.5; the reference truncates instead,
            epoch_utils.py:48-56).  Masked-out columns contribute to
            neither rank count, so padded zero-id negatives never rank."""
            from ..models.tgnn import edge_predictor
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
            return (pos, opt + gt.sum(axis=1), pes + ge.sum(axis=1))

        # metric finalizer: MRR or hits@k, both pure functions of the
        # per-event rank counts (TGB's linkproppred metric surface —
        # the dataset declares which, reference epoch_utils.py:108-113)
        kind, k = parse_eval_metric(self.data.eval_metric)

        def finalize(acc, opt, pes, valid):
            # TGB/OGB tie convention: rank = ½(optimistic + pessimistic)+1
            val = rank_metric_from_counts(opt, pes, kind, k)
            val = jnp.where(valid, val, 0.0)
            batch_mean = val.sum() / jnp.maximum(valid.sum(), 1)
            return acc + jnp.stack([batch_mean, jnp.float32(1.0)])

        self._eval_score_raw = score_counts
        self._eval_score = (jax.jit(score_counts, donate_argnums=(3, 4))
                            if self._jit else score_counts)
        self._eval_finalize = (jax.jit(finalize, donate_argnums=(0,))
                               if self._jit else finalize)

    # --------------------------------------------- slot-unique eval (v3)
    # The column-chunk protocol (evaluate below) embeds each (node,
    # block) pair once per negative chunk — ~M/Mc times per batch.  But
    # a root slot's embedding depends only on its (node, block) pair
    # (cache row + eval clock state + intra window are all functions of
    # the node and the block, never of WHICH other candidates are
    # roots), so packing the batch ONCE with the full M-negative matrix
    # dedups the per-block root sets to the unique candidates (~5x
    # fewer slot embeddings at wiki scale), and ranks come from pure
    # gathers into one embedding table.  Bit-identical ranks: same
    # embedding values, same predictor math, integer rank counts are
    # associative over any column partition
    # (tests/test_eval_unique.py proves MRR equality vs the chunked
    # protocol).  Requires lean dedup wires + gnn.layer == 1 (the same
    # restriction as DedupWire).  DyRep's eager mail is covered too:
    # the unique emb table holds the same per-(node, block) embeddings
    # the chunked protocol's mail-writing chunk used, so the eager
    # commit computes identical messages.

    def _log_eval_gate(self, reason: str) -> None:
        """The chunked fallback is a silent 4-10x eval slowdown; say
        WHICH gate closed, once per (run, reason) — VERDICT r4 weak-5."""
        seen = getattr(self, "_eval_gate_logged", None)
        if seen is None:
            seen = self._eval_gate_logged = set()
        if reason not in seen:
            seen.add(reason)
            print(f"[eval] slot-unique protocol off ({reason}); "
                  f"using the column-chunk protocol", flush=True)

    def _eval_unique_supported(self) -> bool:
        tr = self.config.train
        if tr.eval_slot_unique not in (True, "auto"):
            return False
        for ok, reason in (
                (self._wire_dedup, "wire_dedup off or strategy!=recent"),
                (not self.device_cache, "device_cache mode"),
                (not self._rslot, "gnn.layer>1"),
                (hasattr(self.packer, "pack_wire_dedup"),
                 "packer lacks dedup wires"),
                # max_intra_block=None (exact reference mode) can make a
                # hub-heavy eval batch unrepresentable (P>255) mid-pass;
                # the chunked protocol has a per-batch fallback, this one
                # cannot restart a half-streamed split (ADVICE r4 medium)
                (tr.max_intra_block is not None
                 and tr.max_intra_block <= 255,
                 "max_intra_block=None or >255"),
                # the device clock grid uses a -1 "no event" sentinel
                (self._times_nonneg(), "negative event timestamps")):
            if not ok:
                self._log_eval_gate(reason)
                return False
        return True

    def _times_nonneg(self) -> bool:
        cached = getattr(self, "_times_nonneg_cache", None)
        if cached is None:
            cached = self._times_nonneg_cache = bool(
                len(self.data.t) == 0 or np.asarray(self.data.t).min() >= 0)
        return cached

    def _eval_unique_active(self, split: str, ns, B: int):
        """(use_slot_unique, nb_bucket) for a split: structural support
        + the block count fits the lean wire's u8/u16 id field + (in
        'auto') the estimated per-block candidate dedup is ≥1.5× — on
        large-N datasets (draws/block ≪ N) nearly every candidate is
        unique and the single full-M pack buys nothing over chunks."""
        if ns is None:      # no fixed negatives: nothing to evaluate
            return False, 0
        if not self._eval_unique_supported():
            return False, 0
        blocks = self.blocks_for(split)
        nb_max = int(blocks.max()) + 1 if len(blocks) else 1
        if nb_max > 65536:
            self._log_eval_gate(">65536 dependency blocks in a batch")
            return False, 0
        if self.config.train.eval_slot_unique == "auto":
            ns_arr = np.asarray(ns)
            M = (ns_arr.shape[1] if ns_arr.ndim == 2 else
                 max((len(x) for x in ns_arr), default=1))
            draws_per_block = (2 + M) * B / max(nb_max, 1)
            N = self.data.num_nodes
            dedup_win = draws_per_block / max(
                N * (1.0 - np.exp(-draws_per_block / N)), 1.0)
            if dedup_win < 1.5:
                self._log_eval_gate(
                    f"auto: per-block candidate dedup {dedup_win:.2f}x "
                    f"< 1.5x at N={N}")
                return False, 0
        return True, nb_bucket_of(blocks)

    def _build_unique_eval_step(self):
        model_cfg = self.model_cfg
        arch = self.arch
        K = self.config.sampling.num_neighbors
        N = self.data.num_nodes
        B = self.config.train.batch_size
        use_mem = self.use_memory
        eager = use_mem and self.eager_memory
        mem_cfg = self.mem_cfg if use_mem else None
        SLOT_FIELDS = ("root_loc", "root_cr", "intra_lo", "intra_cnt",
                       "intra_start", "root_blk")

        from ..models.tgnn import edge_predictor
        kind, k_at = parse_eval_metric(self.data.eval_metric)

        def step(params, memory_or_state, tables, wire, mask, valid,
                 acc, iw, n_chunks, n_mc):
            feats, times = tables
            R2 = wire.root_loc.shape[0]
            Rc = R2 // n_chunks
            D = model_cfg.hidden_dim

            # one cheap expand for the chunk-independent parts (uniq
            # table + mailbox write plan — all (Ub,)/(2B,) fields)
            sub0 = wire._replace(**{
                f: getattr(wire, f)[:Rc] for f in SLOT_FIELDS
                if getattr(wire, f) is not None})
            pack0 = expand_any(sub0, K, iw, N, times, eval_mode=True)
            if use_mem and eager:
                mem_rows, lu_rows = eager_apply_mail(
                    params["memory"], mem_cfg, memory_or_state,
                    pack0.uniq_nid)
            elif use_mem:
                mem_rows, lu_rows = apply_mail(
                    params["memory"], mem_cfg, memory_or_state,
                    pack0.uniq_nid, feats)

            xs = tuple(
                getattr(wire, f).reshape(n_chunks, Rc)
                for f in SLOT_FIELDS if getattr(wire, f) is not None)
            xs_fields = tuple(
                f for f in SLOT_FIELDS
                if getattr(wire, f) is not None)

            def embed_body(carry, x):
                emb, off = carry
                sub = wire._replace(**dict(zip(xs_fields, x)))
                pack = expand_any(sub, K, iw, N, times, eval_mode=True)
                if use_mem:
                    e = arch_embed(params, arch, model_cfg, mem_rows,
                                   lu_rows, feats, pack, train=False,
                                   local=True)
                else:
                    e = tgnn_embed(params, model_cfg, memory_or_state,
                                   feats, pack, train=False)
                emb = jax.lax.dynamic_update_slice(
                    emb, e.astype(emb.dtype), (off, 0))
                return (emb, off + Rc), None

            emb0 = jnp.zeros((R2, D), model_cfg.compute_dtype)
            (emb, _), _ = jax.lax.scan(embed_body,
                                       (emb0, jnp.int32(0)), xs)

            # scoring: gathers into the table, scanned over negative
            # column chunks (identical per-column math to score_counts)
            h_src = emb[wire.ev_src_slot.astype(jnp.int32)]
            h_pos = emb[wire.ev_pos_slot.astype(jnp.int32)]
            neg_slot = wire.ev_neg_slot.astype(jnp.int32)   # (B, Mp)
            Mc2 = neg_slot.shape[1] // n_mc
            ns_x = neg_slot.reshape(B, n_mc, Mc2).transpose(1, 0, 2)
            m_x = mask.reshape(B, n_mc, Mc2).transpose(1, 0, 2)

            def score_body(carry, x):
                opt, pes = carry
                ns, m = x
                pos, neg = edge_predictor(params["pred"], h_src, h_pos,
                                          emb[ns])
                p = pos[:, None]
                gt = jnp.logical_and(neg > p, m)
                ge = jnp.logical_and(neg >= p, m)
                return (opt + gt.sum(axis=1).astype(jnp.int32),
                        pes + ge.sum(axis=1).astype(jnp.int32)), None

            z = jnp.zeros(B, jnp.int32)
            (opt, pes), _ = jax.lax.scan(score_body, (z, z), (ns_x, m_x))

            # per-batch-mean metric accumulate (the finalize phase,
            # fused in: one dispatch per batch instead of two)
            val = rank_metric_from_counts(opt, pes, kind, k_at)
            val = jnp.where(valid, val, 0.0)
            batch_mean = val.sum() / jnp.maximum(valid.sum(), 1)
            acc = acc + jnp.stack([batch_mean, jnp.float32(1.0)])

            if use_mem and eager:
                # DyRep: eager mail computes from the batch's embeddings
                # — the unique emb table holds exactly the per-(node,
                # block) embeddings the chunked protocol's LAST chunk
                # used (slot-unique principle), and the write plan is
                # event-level.  pack0's root-slot tables are SLICED to
                # the first embed chunk, so dyrep_messages gets the FULL
                # (R2,) slot→loc map (the ev_src_loc lesson, CLAUDE.md).
                full_pack = pack0._replace(
                    root_loc=wire.root_loc.astype(jnp.int32))
                mw_mail = dyrep_messages(mem_cfg, emb, full_pack, feats,
                                         params["time"], mem_rows,
                                         lu_rows)
                mem_state = eager_commit(mem_cfg, memory_or_state,
                                         pack0.uniq_nid, mem_rows,
                                         lu_rows, pack0.mw_node,
                                         pack0.mw_slot, mw_mail,
                                         pack0.mw_t, pack0.mw_eid)
                return acc, mem_state
            if use_mem:
                mem_state = commit(mem_cfg, memory_or_state,
                                   pack0.uniq_nid, mem_rows, lu_rows,
                                   pack0.mw_node, pack0.mw_slot,
                                   pack0.mw_partner, pack0.mw_t,
                                   pack0.mw_eid)
                return acc, mem_state
            return acc

        if self._jit:
            return jax.jit(step, static_argnums=(7, 8, 9),
                           donate_argnums=(1, 6) if use_mem else (6,))
        return step

    def _eval_unique_batches(self, split: str, fixed, B: int, nb_bucket):
        """One full-M lean dedup wire per batch, padded to an embed-
        chunk multiple; packs run one batch ahead on the C++ worker
        when available (same pipeline as _eval_packed_chunks)."""
        d = self.data

        def prep(out, blk, braw, M, qmask):
            if out is None:
                # _eval_unique_supported guarantees representability
                # (max_intra_block ≤ 255, layer==1); reaching here means
                # a gate is out of sync with the packer — fail loudly
                # instead of corrupting the pass (ADVICE r4 medium)
                raise RuntimeError(
                    "slot-unique eval: dedup pack unrepresentable "
                    "mid-split; set train.eval_slot_unique=False or "
                    "train.max_intra_block<=255")
            wire, iw = out
            wire = eval_lean_dedup(wire, blk, nb_bucket)
            if wire.cache_dt is not None:
                raise RuntimeError(
                    "slot-unique eval requires the lean wire (block "
                    "count or negative timestamps rejected it); set "
                    "train.eval_slot_unique=False")
            R = wire.root_loc.shape[0]
            n_chunks = max(1, -(-R // 49152))
            Rc = -(-R // n_chunks)
            R2 = n_chunks * Rc
            if R2 != R:
                Ub = wire.uniq_nid.shape[0]
                pads = {
                    "root_loc": Ub - 1, "root_cr": 0, "intra_lo": 0,
                    "intra_cnt": 0, "intra_start": 0, "root_blk": 0,
                }
                wire = wire._replace(**{
                    f: np.concatenate(
                        [np.asarray(getattr(wire, f)),
                         np.full(R2 - R, v,
                                 np.asarray(getattr(wire, f)).dtype)])
                    for f, v in pads.items()})
            # pad negative columns to a 256-multiple for the score scan
            n_mc = max(1, -(-M // 256))
            Mp = n_mc * 256
            ns = np.asarray(wire.ev_neg_slot).reshape(B, -1)
            mask = np.zeros((B, Mp), bool)
            mask[:braw, :M] = True
            if qmask is not None:       # pad_mask ragged negatives
                mask[:braw, :M] &= np.asarray(qmask, bool)
            if Mp != M:
                ns = np.concatenate(
                    [ns, np.zeros((B, Mp - M), ns.dtype)], axis=1)
            wire = wire._replace(ev_neg_slot=ns)
            return wire, iw, mask, n_chunks, n_mc

        use_async = getattr(self.packer, "async_available",
                            lambda: False)()
        pend = None                     # (lo, hi, M, args, qmask)
        for lo, hi, rows, blk in self._iter_batches(split):
            src, dst, t = d.src[rows], d.dst[rows], d.t[rows]
            neg, qmask = fixed.query_batch(lo, hi)
            neg2d = np.asarray(neg).reshape(len(rows), -1)
            M = neg2d.shape[1]
            args = (src, dst, t, rows, blk, neg2d)
            ready = None
            if pend is not None:
                out = self.packer.pack_wire_dedup_fetch()
                if out is None:
                    out = self._pack_dedup(*pend[3], True)
                ready = pend[:3] + prep(out, pend[3][4],
                                        pend[1] - pend[0], pend[2],
                                        pend[4])
                pend = None
            # submit the NEXT pack before yielding, so the C++ worker
            # overlaps the consumer's dispatch of the previous batch
            if use_async and self.packer.pack_wire_dedup_submit(
                    *args, eval_mode=True):
                pend = (lo, hi, M, args, qmask)
                if ready is not None:
                    yield ready
                continue
            if ready is not None:
                yield ready
            out = self._pack_dedup(*args, True)
            yield (lo, hi, M) + prep(out, blk, hi - lo, M, qmask)
        if pend is not None:
            out = self.packer.pack_wire_dedup_fetch()
            if out is None:
                out = self._pack_dedup(*pend[3], True)
            yield pend[:3] + prep(out, pend[3][4], pend[1] - pend[0],
                                  pend[2], pend[4])

    def _evaluate_unique(self, split: str, fixed, B: int,
                         nb_bucket: int) -> float:
        if not hasattr(self, "_unique_eval_step"):
            self._unique_eval_step = self._build_unique_eval_step()
        acc = jnp.zeros(2, jnp.float32)
        for (lo, hi, M, wire, iw, mask, n_chunks,
             n_mc) in self._eval_unique_batches(split, fixed, B,
                                                nb_bucket):
            self.dispatch_count += 1     # ONE fused step per batch
            valid = np.arange(B) < (hi - lo)
            if self.use_memory:
                acc, self.mem_state = self._unique_eval_step(
                    self.params, self.mem_state, self._tables, wire,
                    mask, valid, acc, iw, n_chunks, n_mc)
            else:
                acc = self._unique_eval_step(
                    self.params, self.memory, self._tables, wire, mask,
                    valid, acc, iw, n_chunks, n_mc)
        try:
            acc.copy_to_host_async()
        except Exception:
            pass
        vals = np.asarray(acc)
        return float(vals[0] / max(vals[1], 1.0))

    # ------------------------------------------------- device-cache mode
    # Lean variants (train.device_cache=True): the streaming state
    # (recency cache + clocks) is a donated device pytree threaded through
    # every step; the host ships event-only LeanWires (ops/lean_wire.py).
    def _build_lean_train_step(self):
        from ..ops.lean_wire import advance_stream, expand_lean

        model_cfg = self.model_cfg
        optimizer = self.optimizer
        K = self.config.sampling.num_neighbors
        N = self.data.num_nodes
        B = self.config.train.batch_size

        def train_metrics(acc, loss, pos, neg, valid):
            n = valid.sum()
            neg1 = neg if neg.ndim == 1 else neg[:, 0]
            ap, auc = jnp_ap_auc(jax.nn.sigmoid(pos),
                                 jax.nn.sigmoid(neg1), valid)
            return acc + jnp.stack([loss.astype(jnp.float32) * n, ap, auc,
                                    jnp.float32(1.0)])

        if self.use_memory:
            mem_cfg = self.mem_cfg

            def step(params, opt_state, mem_state, sstate, feats, wire,
                     rng, acc, intra_width):
                pack, nid = expand_lean(wire, sstate, K, intra_width, N,
                                        eval_mode=False, batch_size=B)

                def loss_fn(p):
                    mem_rows, lu_rows = apply_mail(p["memory"], mem_cfg,
                                                   mem_state, nid, feats)
                    pos, neg = tgnn_forward(p, model_cfg, mem_rows, feats,
                                            pack, train=True, rng=rng,
                                            local=True)
                    return (bce_loss(pos, neg, pack.ev_valid),
                            (pos, neg, mem_rows, lu_rows))

                (loss, (pos, neg, mem_rows, lu_rows)), grads = \
                    jax.value_and_grad(loss_fn, has_aux=True)(params)
                # duplicate nids scatter identical rows — order-safe
                mem_state = commit(mem_cfg, mem_state, nid, mem_rows,
                                   lu_rows, pack.mw_node, pack.mw_slot,
                                   pack.mw_partner, pack.mw_t,
                                   pack.mw_eid)
                sstate = advance_stream(sstate, wire, N, eval_mode=False)
                updates, opt_state = optimizer.update(grads, opt_state,
                                                      params)
                params = optax.apply_updates(params, updates)
                acc = train_metrics(acc, loss, pos, neg, pack.ev_valid)
                return (params, opt_state, mem_state, sstate, loss, pos,
                        neg, acc)

            self._train_step_raw = step
            if self._jit:
                return jax.jit(step, donate_argnums=(0, 1, 2, 3, 7),
                               static_argnums=(8,))
            return step

        def step(params, opt_state, memory, sstate, feats, wire, rng,
                 acc, intra_width):
            pack, _nid = expand_lean(wire, sstate, K, intra_width, N,
                                     eval_mode=False, batch_size=B)

            def loss_fn(p):
                pos, neg = tgnn_forward(p, model_cfg, memory, feats, pack,
                                        train=True, rng=rng)
                return bce_loss(pos, neg, pack.ev_valid), (pos, neg)

            (loss, (pos, neg)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            sstate = advance_stream(sstate, wire, N, eval_mode=False)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            acc = train_metrics(acc, loss, pos, neg, pack.ev_valid)
            return params, opt_state, sstate, loss, pos, neg, acc

        self._train_step_raw = step
        if self._jit:
            return jax.jit(step, donate_argnums=(0, 1, 3, 7),
                           static_argnums=(8,))
        return step

    def _build_lean_fused_train_step(self):
        # UNROLLED, not lax.scan: inside a while loop XLA fails to fuse
        # the lean body's broadcast-cos/gathers into the attention
        # matmuls and materializes (R, Kp, D) intermediates in pathological
        # layouts — profiler-measured 45 ms/iteration vs 0.74 ms for the
        # identical straight-line step (and 100×-longer compiles).  G is
        # static from the stacked leading dim, so a Python loop emits
        # straight-line code.
        body = self._train_step_raw

        if self.use_memory:
            def fused(params, opt_state, mem_state, sstate, feats, wires,
                      rng, acc, intra_width):
                G = wires.ev_src.shape[0]
                loss = None
                for i in range(G):
                    wire = jax.tree.map(lambda a: a[i], wires)
                    sk = derive_key(rng, 64 * i)
                    (params, opt_state, mem_state, sstate, loss, _p, _n,
                     acc) = body(params, opt_state, mem_state, sstate,
                                 feats, wire, sk, acc, intra_width)
                return params, opt_state, mem_state, sstate, acc, loss

            if self._jit:
                return jax.jit(fused, donate_argnums=(0, 1, 2, 3, 7),
                               static_argnums=(8,))
            return fused

        def fused(params, opt_state, memory, sstate, feats, wires, rng,
                  acc, intra_width):
            G = wires.ev_src.shape[0]
            loss = None
            for i in range(G):
                wire = jax.tree.map(lambda a: a[i], wires)
                sk = derive_key(rng, 64 * i)
                params, opt_state, sstate, loss, _p, _n, acc = body(
                    params, opt_state, memory, sstate, feats, wire, sk,
                    acc, intra_width)
            return params, opt_state, sstate, acc, loss

        if self._jit:
            return jax.jit(fused, donate_argnums=(0, 1, 3, 7),
                           static_argnums=(8,))
        return fused

    def _build_lean_eval_forward(self):
        from ..ops.lean_wire import advance_stream, expand_lean

        self._setup_eval_scoring()
        model_cfg = self.model_cfg
        K = self.config.sampling.num_neighbors
        N = self.data.num_nodes
        B = self.config.train.batch_size

        if self.use_memory:
            mem_cfg = self.mem_cfg

            def fwd(params, mem_state, sstate, feats, wire, intra_width,
                    advance):
                pack, nid = expand_lean(wire, sstate, K, intra_width, N,
                                        eval_mode=True, batch_size=B)
                mem_rows, lu_rows = apply_mail(params["memory"], mem_cfg,
                                               mem_state, nid, feats)
                embed = tgnn_embed(params, model_cfg, mem_rows, feats,
                                   pack, train=False, local=True)
                mem_state = commit(mem_cfg, mem_state, nid, mem_rows,
                                   lu_rows, pack.mw_node, pack.mw_slot,
                                   pack.mw_partner, pack.mw_t,
                                   pack.mw_eid)
                if advance:
                    sstate = advance_stream(sstate, wire, N,
                                            eval_mode=True)
                return embed, mem_state, sstate

            self._eval_fwd_raw = fwd
            if self._jit:
                return jax.jit(fwd, donate_argnums=(1, 2),
                               static_argnums=(5, 6))
            return fwd

        def fwd(params, memory, sstate, feats, wire, intra_width,
                advance):
            pack, _nid = expand_lean(wire, sstate, K, intra_width, N,
                                     eval_mode=True, batch_size=B)
            embed = tgnn_embed(params, model_cfg, memory, feats, pack,
                               train=False)
            if advance:
                sstate = advance_stream(sstate, wire, N, eval_mode=True)
            return embed, sstate

        self._eval_fwd_raw = fwd
        if self._jit:
            return jax.jit(fwd, donate_argnums=(2,), static_argnums=(5, 6))
        return fwd

    def _build_lean_fused_eval_step(self):
        fwd = self._eval_fwd_raw
        score = self._eval_score_raw

        if self.use_memory:
            def fused(params, mem_state, sstate, feats, wires, masks, opt,
                      pes, intra_width):
                # unrolled, not scanned — see _build_lean_fused_train_step
                G = wires.ev_src.shape[0]
                for i in range(G):
                    wire = jax.tree.map(lambda a: a[i], wires)
                    m = None if masks is None else masks[i]
                    embed, mem_state, _ = fwd(params, mem_state, sstate,
                                              feats, wire, intra_width,
                                              False)
                    _pos, opt, pes = score(params, embed, wire, opt, pes, m)
                return mem_state, opt, pes, opt.sum()

            if self._jit:
                return jax.jit(fused, donate_argnums=(1, 6, 7),
                               static_argnums=(8,))
            return fused

        def fused(params, memory, sstate, feats, wires, masks, opt, pes,
                  intra_width):
            G = wires.ev_src.shape[0]
            for i in range(G):
                wire = jax.tree.map(lambda a: a[i], wires)
                m = None if masks is None else masks[i]
                embed, _ = fwd(params, memory, sstate, feats, wire,
                               intra_width, False)
                _pos, opt, pes = score(params, embed, wire, opt, pes, m)
            return opt, pes, opt.sum()

        if self._jit:
            return jax.jit(fused, donate_argnums=(6, 7),
                           static_argnums=(8,))
        return fused

    def _build_eval_forward(self):
        if self.device_cache:
            return self._build_lean_eval_forward()
        model_cfg = self.model_cfg
        K = self.config.sampling.num_neighbors
        N = self.data.num_nodes

        arch = self.arch

        # Eval runs as small jitted phases per negative-set CHUNK: (1)
        # memory update + embedding + state commit, (2) edge scoring into
        # per-event rank COUNTS.  Ranks are additive across chunks, so
        # chunking is exact; it is required because every (block,
        # negative) pair gets its own root slot (reference
        # model_utils.py:85-92) and M=999 on one grid is a >500K-slot
        # 12 GB program that OOMs HBM.  No extra host fetches: counts
        # accumulate on device, one fetch per eval pass.
        self._setup_eval_scoring()

        rslot = self._rslot

        if self.use_memory and self.eager_memory:       # DyRep
            mem_cfg = self.mem_cfg

            def fwd(params, mem_state, tables, wire, intra_width):
                feats, times = tables
                pack = expand_any(wire, K, intra_width, N, times,
                                  eval_mode=True, with_rslot=rslot)
                mem_rows, lu_rows = eager_apply_mail(
                    params["memory"], mem_cfg, mem_state, pack.uniq_nid)
                embed = arch_embed(params, arch, model_cfg, mem_rows,
                                   lu_rows, feats, pack, train=False,
                                   local=True)
                mw_mail = dyrep_messages(mem_cfg, embed, pack, feats,
                                         params["time"], mem_rows, lu_rows)
                mem_state = eager_commit(mem_cfg, mem_state, pack.uniq_nid,
                                         mem_rows, lu_rows, pack.mw_node,
                                         pack.mw_slot, mw_mail, pack.mw_t,
                                         pack.mw_eid)
                return embed, mem_state

            self._eval_fwd_raw = fwd
            if self._jit:
                return jax.jit(fwd, donate_argnums=(1,), static_argnums=(4,))
            return fwd

        if self.use_memory:                              # TGN / JODIE
            mem_cfg = self.mem_cfg

            def fwd(params, mem_state, tables, wire, intra_width):
                feats, times = tables
                pack = expand_any(wire, K, intra_width, N, times,
                                  eval_mode=True, with_rslot=rslot)
                mem_rows, lu_rows = apply_mail(
                    params["memory"], mem_cfg, mem_state, pack.uniq_nid,
                    feats)
                embed = arch_embed(params, arch, model_cfg, mem_rows,
                                   lu_rows, feats, pack, train=False,
                                   local=True)
                mem_state = commit(mem_cfg, mem_state, pack.uniq_nid,
                                   mem_rows, lu_rows, pack.mw_node,
                                   pack.mw_slot, pack.mw_partner,
                                   pack.mw_t, pack.mw_eid)
                return embed, mem_state

            self._eval_fwd_raw = fwd
            if self._jit:
                return jax.jit(fwd, donate_argnums=(1,), static_argnums=(4,))
            return fwd

        def fwd(params, memory, tables, wire, intra_width):
            feats, times = tables
            pack = expand_any(wire, K, intra_width, N, times,
                              eval_mode=True, with_rslot=rslot)
            embed = tgnn_embed(params, model_cfg, memory, feats, pack,
                               train=False)
            return embed

        self._eval_fwd_raw = fwd
        return jax.jit(fwd, static_argnums=(4,)) if self._jit else fwd

    def _build_fused_eval_step(self):
        """G same-shape negative-chunk (forward + score) phases in ONE
        dispatch via lax.scan.  The TGB M=999 protocol runs ~M/Mc chunks
        per batch (engine.evaluate); per-chunk dispatch over a tunneled
        backend dominates eval wall-clock the same way per-batch dispatch
        dominates train (see _build_fused_train_step).  Rank counts are
        additive across chunks, so scanning them is exact."""
        if self.device_cache:
            return self._build_lean_fused_eval_step()
        fwd = self._eval_fwd_raw
        score = self._eval_score_raw

        if self.use_memory:
            def fused(params, mem_state, tables, wires, masks, opt, pes,
                      intra_width):
                xs = wires if masks is None else (wires, masks)

                def body(carry, x):
                    wire, m = (x, None) if masks is None else x
                    mem_state, opt, pes = carry
                    embed, mem_state = fwd(params, mem_state, tables, wire,
                                           intra_width)
                    _pos, opt, pes = score(params, embed, wire, opt, pes, m)
                    return (mem_state, opt, pes), None

                (mem_state, opt, pes), _ = jax.lax.scan(
                    body, (mem_state, opt, pes), xs)
                # opt.sum() = fresh (undonated) completion handle
                return mem_state, opt, pes, opt.sum()

            if self._jit:
                return jax.jit(fused, donate_argnums=(1, 5, 6),
                               static_argnums=(7,))
            return fused

        def fused(params, memory, tables, wires, masks, opt, pes,
                  intra_width):
            xs = wires if masks is None else (wires, masks)

            def body(carry, x):
                wire, m = (x, None) if masks is None else x
                opt, pes = carry
                embed = fwd(params, memory, tables, wire, intra_width)
                _pos, opt, pes = score(params, embed, wire, opt, pes, m)
                return (opt, pes), None

            (opt, pes), _ = jax.lax.scan(body, (opt, pes), xs)
            return opt, pes, opt.sum()

        if self._jit:
            return jax.jit(fused, donate_argnums=(5, 6),
                           static_argnums=(7,))
        return fused

    # -------------------------------------------------- bucket pre-warming
    def warm_buckets(self, n_batches: int = 96,
                     eval_batches: int = 8) -> None:
        """Pre-ratchet the packer's sticky shape buckets by replaying the
        first ``n_batches`` train batches through a THROWAWAY packer
        clone (host-only, ~5 ms/batch) and seeding the real packer's
        sticky table with the observed maxima.  Without this, every
        intermediate ratchet step of R/Ub/Ur/P/Ei during the first epoch
        is a fresh jit signature (20-300 s XLA compile each on tunneled
        backends); with it, a run converges to ONE compile per profile
        in almost all cases (ADVICE.md r1).  No stream or RNG state is
        touched: the clone gets a same-seed negative-sampler copy.

        ``eval_batches`` additionally replays the first validation
        batches in eval mode with the SAME negative chunking
        ``evaluate`` will use, pre-ratcheting the (Mc, eval) profiles so
        the first validation pass also compiles once per profile instead
        of ratcheting through fresh signatures mid-eval."""
        if not hasattr(self.packer, "_sticky"):
            return
        pk_cfg = PackerConfig(
            num_neighbors=self.config.sampling.num_neighbors,
            batch_size=self.config.train.batch_size,
            max_intra_block=self.config.train.max_intra_block,
            mailbox_size=self.config.memory.mailbox_size,
            strategy=self.config.sampling.strategy,
            seed=self.config.train.seed,
            layers=self.config.gnn.layer,
        )
        if self.device_cache:
            # lean-wire shapes (R/P/Ei/Kb) are pure functions of the
            # event stream, so a throwaway lean packer pre-ratchets them
            # exactly (VERDICT r3 weak-2: this mode used to skip the
            # warm and ratchet fresh XLA signatures mid-first-epoch)
            from ..data.lean_packer import make_lean_packer
            probe = make_lean_packer(self.data.num_nodes, pk_cfg)
        else:
            probe = make_stream_packer(self.data.num_nodes, pk_cfg)
        if self.config.sampling.strategy == "uniform":
            # share the engine's t-CSR read-only (it is immutable); the
            # probe's SAME-SEED rng replays the real first epoch's
            # uniform draws without touching the real packer's stream
            tcsr = getattr(self.packer, "_tcsr", None)
            if tcsr is None:
                return
            probe.set_tcsr(tcsr)
        neg_probe = NegLinkSamplerDest(self.data.unique_dst(),
                                       seed=self.config.train.seed)
        d = self.data
        done = 0
        for lo, hi, rows, blk in self._iter_batches("train"):
            if done >= n_batches:
                break
            src, dst, t = d.src[rows], d.dst[rows], d.t[rows]
            neg = neg_probe.sample(dst)
            if self._wire_dedup and hasattr(probe, "pack_wire_dedup"):
                out = probe.pack_wire_dedup(src, dst, t, rows, blk, neg)
                if out is None:
                    probe.pack_wire(src, dst, t, rows, blk, neg)
            else:
                probe.pack_wire(src, dst, t, rows, blk, neg)
            done += 1
        # eval-profile pre-warm: replay the first val batches with the
        # SAME protocol evaluate will use (slot-unique full-M packs, or
        # the Mc column-chunk math)
        if eval_batches and d.val_ns is not None:
            fixed = FixedNegatives(d.val_ns,
                                   mode=self.config.train.eval_neg_mode)
            # pre-warm the SAME protocol evaluate will pick
            # (ShardedEngine borrows this method without the
            # slot-unique machinery — chunk protocol there)
            if hasattr(self, "_eval_unique_active"):
                unique, _nb = self._eval_unique_active(
                    "val", d.val_ns, self.config.train.batch_size)
            else:
                unique = False
            done = 0
            for lo, hi, rows, blk in self._iter_batches("val"):
                if done >= eval_batches:
                    break
                src, dst, t = d.src[rows], d.dst[rows], d.t[rows]
                neg, _mask = fixed.query_batch(lo, hi)
                neg2d = np.asarray(neg).reshape(len(rows), -1)
                M = neg2d.shape[1]
                if unique:
                    out = probe.pack_wire_dedup(src, dst, t, rows, blk,
                                                neg2d, eval_mode=True)
                    if out is None:
                        probe.pack_wire(src, dst, t, rows, blk, neg2d,
                                        eval_mode=True)
                    done += 1
                    continue
                Mc = eval_neg_chunk_size(self.config, M, hi - lo)
                n_chunks = -(-M // Mc)
                for ci in range(n_chunks):
                    last = ci == n_chunks - 1
                    neg_c = neg2d[:, ci * Mc:(ci + 1) * Mc]
                    if self._wire_dedup and hasattr(probe,
                                                    "pack_wire_dedup"):
                        out = probe.pack_wire_dedup(
                            src, dst, t, rows, blk, neg_c, eval_mode=True,
                            insert=last, write_mail=last)
                        if out is None:
                            probe.pack_wire(src, dst, t, rows, blk, neg_c,
                                            eval_mode=True, insert=last,
                                            write_mail=last)
                    else:
                        probe.pack_wire(src, dst, t, rows, blk, neg_c,
                                        eval_mode=True, insert=last,
                                        write_mail=last)
                done += 1
        # seed the real packer's sticky maxima (monotone merge)
        for key, names in probe._sticky.items():
            for name, val in names.items():
                self.packer._sticky_bucket(key, name, val)

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
    def _prefetch(self, split: str, eval_negs=None):
        """Pack batches for the device loop; yields (lo, hi, wire,
        intra_width).  jax dispatch is asynchronous, so packing batch i+1
        on the main thread already overlaps the device executing batch i
        — a worker-thread queue was measured 3x SLOWER here (GIL/context-
        switch ping-pong on a 2-core host).  When the NATIVE packer is
        live, the pack itself additionally runs one batch ahead on a C++
        worker thread (no GIL involvement — the round-1 failure mode
        doesn't apply), overlapping host packing with python-side
        dispatch/stacking of the previous batch."""
        if (eval_negs is None and self._wire_dedup
                and getattr(self.packer, "async_available",
                            lambda: False)()):
            yield from self._prefetch_pipelined(split)
            return
        d = self.data
        lean_train = self._train_lean and eval_negs is None
        nb_bucket = self._train_nb_bucket(split) if lean_train else 0
        for lo, hi, rows, blk in self._iter_batches(split):
            src, dst, t = d.src[rows], d.dst[rows], d.t[rows]
            if eval_negs is None:
                neg = self.neg_sampler.sample(dst)
                em = False
            else:
                neg, _mask = eval_negs.query_batch(lo, hi)
                em = True
            if lean_train:
                # pre-batch clock snapshot (the pack advances it);
                # clock_snapshot is a fresh copy — no second np.array
                snap = self.packer.clock_snapshot()
            out = self._pack_dedup(src, dst, t, rows, blk, neg, em)
            if out is not None:
                wire, iw = out
                if lean_train:
                    wire = train_lean_dedup(wire, blk, nb_bucket, snap)
                yield lo, hi, wire, iw
                continue
            wire, iw = self.packer.pack_wire(src, dst, t, rows, blk, neg,
                                             eval_mode=em)
            yield lo, hi, self._maybe_compact(wire, iw), iw

    def _train_nb_bucket(self, split: str = "train") -> int:
        """Static block-count bucket for the train-lean clock grid
        (one compiled signature per split)."""
        cached = getattr(self, "_train_nb_cache", None)
        if cached is None:
            cached = self._train_nb_cache = {}
        if split not in cached:
            cached[split] = nb_bucket_of(self.blocks_for(split))
        return cached[split]

    def _prefetch_pipelined(self, split: str):
        """One-deep pack-ahead: batch i+1 packs inside the native packer's
        C++ worker thread while the caller dispatches batch i
        (csrc/packer.cpp async API; VERDICT r3 item 2).  Submission order
        equals stream order and the pipeline drains before the generator
        finishes, so stream state matches the synchronous path exactly —
        the wires themselves are bit-identical (the worker runs the same
        begin/fill code into staging buffers)."""
        d = self.data
        lean_train = self._train_lean
        nb_bucket = self._train_nb_bucket(split) if lean_train else 0

        def sync_pack(args):
            wire, iw = self.packer.pack_wire(*args)
            return self._maybe_compact(wire, iw), iw

        def lean(out, pend):
            """Apply the train-lean post-pass to a fetched dedup wire
            (pend = (lo, hi, args, snap))."""
            if not lean_train or not isinstance(out[0], DedupWire):
                return out
            return (train_lean_dedup(out[0], pend[2][4], nb_bucket,
                                     pend[3]), out[1])

        def snap():
            # pre-batch clock snapshot, taken BEFORE submit (the worker
            # advances the clock while packing); clock_snapshot reads
            # only the (N,) clock, not the full packer state
            return self.packer.clock_snapshot() if lean_train else None

        pend = None                # (lo, hi, args, clock_snap) submitted
        for lo, hi, rows, blk in self._iter_batches(split):
            src, dst, t = d.src[rows], d.dst[rows], d.t[rows]
            neg = self.neg_sampler.sample(dst)
            args = (src, dst, t, rows, blk, neg)
            if pend is not None:
                out = self.packer.pack_wire_dedup_fetch()
                if out is None:          # P>255: repack synchronously
                    out = sync_pack(pend[2])
                else:
                    out = lean(out, pend)
                plo, phi = pend[0], pend[1]
                s = snap()
                if self.packer.pack_wire_dedup_submit(*args):
                    pend = (lo, hi, args, s)
                    yield plo, phi, out[0], out[1]
                else:                    # unsubmittable batch: go sync
                    pend = None
                    yield plo, phi, out[0], out[1]
                    yield (lo, hi) + sync_pack(args)
            else:
                s = snap()
                if self.packer.pack_wire_dedup_submit(*args):
                    pend = (lo, hi, args, s)
                else:
                    yield (lo, hi) + sync_pack(args)
        if pend is not None:
            out = self.packer.pack_wire_dedup_fetch()
            if out is None:
                out = sync_pack(pend[2])
            else:
                out = lean(out, pend)
            yield pend[0], pend[1], out[0], out[1]

    def _eval_chunk_args(self, split: str, fixed, B: int):
        """Yields one entry per negative CHUNK of the eval protocol:
        (lo, hi, first, last, mask_c, pack_args, pack_kwargs)."""
        d = self.data
        for lo, hi, rows, blk in self._iter_batches(split):
            src, dst, t = d.src[rows], d.dst[rows], d.t[rows]
            neg, mask = fixed.query_batch(lo, hi)
            neg2d = np.asarray(neg).reshape(len(rows), -1)
            M = neg2d.shape[1]
            # pad+mask mode: (B, M) validity of each negative column
            # (padded events' rows stay False; finalize masks them anyway)
            mask2d = None
            if mask is not None:
                mask2d = np.zeros((B, M), bool)
                mask2d[:len(rows)] = mask
            Mc = eval_neg_chunk_size(self.config, M, hi - lo)
            n_chunks = -(-M // Mc)
            for ci in range(n_chunks):
                last = ci == n_chunks - 1
                neg_c = neg2d[:, ci * Mc:(ci + 1) * Mc]
                mask_c = (None if mask2d is None
                          else mask2d[:, ci * Mc:(ci + 1) * Mc])
                # stream state (cache insert, mail writes, ring
                # pointers) advances only on the last chunk; memory
                # commits of PENDING mail are idempotent across chunks
                yield (lo, hi, ci == 0, last, mask_c,
                       (src, dst, t, rows, blk, neg_c),
                       dict(eval_mode=True, insert=last,
                            write_mail=last))

    def _eval_packed_chunks(self, split: str, fixed, B: int):
        """Packed eval chunks, (lo, hi, first, last, mask_c, wire, iw);
        with the native packer the pack runs one chunk ahead on the C++
        worker thread (same one-deep pipeline as _prefetch_pipelined —
        submission order is chunk order, so the insert/write_mail state
        advance on each batch's LAST chunk lands exactly where the
        synchronous path puts it).

        Dedup wires ship EVAL-LEAN (ops/wire.eval_lean_dedup): the
        per-slot f32 Δt fields — the largest wire fields at M=999 chunk
        scale (~2.1 of 2.9 MB per chunk) — are dropped and re-derived
        bit-exactly on device from the resident global time table plus
        tiny per-block metadata (expand_dedup's lean branch)."""
        # static block-count bucket for the whole pass: ONE compiled
        # signature instead of a mid-eval ratchet
        nb_bucket = nb_bucket_of(self.blocks_for(split))

        def lean(out, blk):
            wire, iw = out
            if isinstance(wire, DedupWire):
                wire = eval_lean_dedup(wire, blk, nb_bucket)
            return wire, iw

        def sync_pack(args, kw):
            out = self._pack_dedup(*args, kw["eval_mode"],
                                   insert=kw["insert"],
                                   write_mail=kw["write_mail"])
            if out is not None:
                return lean(out, args[4])
            wire, iw = self.packer.pack_wire(*args, **kw)
            return self._maybe_compact(wire, iw), iw

        it = self._eval_chunk_args(split, fixed, B)
        if not (self._wire_dedup
                and getattr(self.packer, "async_available",
                            lambda: False)()):
            for lo, hi, first, last, mask_c, args, kw in it:
                wire, iw = sync_pack(args, kw)
                yield lo, hi, first, last, mask_c, wire, iw
            return
        pend = None              # (meta, args, kw) of the submitted job
        for lo, hi, first, last, mask_c, args, kw in it:
            meta = (lo, hi, first, last, mask_c)
            if pend is not None:
                out = self.packer.pack_wire_dedup_fetch()
                if out is None:              # P>255: repack synchronously
                    out = sync_pack(pend[1], pend[2])
                else:
                    out = lean(out, pend[1][4])
                pmeta = pend[0]
                if self.packer.pack_wire_dedup_submit(*args, **kw):
                    pend = (meta, args, kw)
                    yield pmeta + out
                else:
                    pend = None
                    yield pmeta + out
                    yield meta + sync_pack(args, kw)
            elif self.packer.pack_wire_dedup_submit(*args, **kw):
                pend = (meta, args, kw)
            else:
                yield meta + sync_pack(args, kw)
        if pend is not None:
            out = self.packer.pack_wire_dedup_fetch()
            if out is None:
                out = sync_pack(pend[1], pend[2])
            else:
                out = lean(out, pend[1][4])
            yield pend[0] + out

    def _pack_dedup(self, src, dst, t, rows, blk, neg, eval_mode,
                    insert=True, write_mail=True):
        """Try the deduplicated wire (ops/wire.DedupWire); returns
        (wire, intra_width) or None — the caller then packs the compact
        wire.  The packer only advances state when it succeeds, so
        per-batch fallback is safe."""
        if not self._wire_dedup or not hasattr(self.packer,
                                               "pack_wire_dedup"):
            return None
        return self.packer.pack_wire_dedup(src, dst, t, rows, blk, neg,
                                           eval_mode=eval_mode,
                                           insert=insert,
                                           write_mail=write_mail)

    def _maybe_compact(self, wire, iw):
        """Narrow the wire dtypes when enabled and possible (ops/wire.py);
        returns the original wire otherwise — expand_wire accepts both."""
        if not self._wire_compact or not isinstance(wire, tuple) \
                or not hasattr(wire, "ia_row"):
            return wire
        cw = compact_wire(wire, self.data.num_nodes, iw,
                          self.config.memory.mailbox_size)
        return wire if cw is None else cw

    def _host_key(self, step: int):
        """Typed per-step dropout key computed on the HOST (numpy) —
        see the schedule note in __init__.  Stride 64 leaves offsets
        1..63 for model-local subkeys (models/init.derive_key)."""
        from ..models.init import _DERIVE_C
        c = _DERIVE_C[: self._base_kd.shape[-1]]
        kd = self._base_kd + np.uint32((64 * step) & 0xFFFFFFFF) * c
        return jax.random.wrap_key_data(jnp.asarray(kd),
                                        impl=self._rng_impl)

    def train_epoch(self) -> "EpochStats":
        d = self.data
        self.packer.reset_cache()
        if self.device_cache:
            from ..ops.lean_wire import reset_stream_cache
            self.sstate = reset_stream_cache(self.sstate)
        if self.use_memory:
            # memory + cache reset together at train start (reference
            # pyg_epoch_utils.py:11-16)
            if self.eager_memory:
                self.mem_state = init_eager_memory_state(
                    self.mem_cfg, self.config.memory.mailbox_size)
            else:
                self.mem_state = init_memory_state(self.mem_cfg)
        # Metrics accumulate ON DEVICE inside the train step (a running
        # (4,) accumulator) and are fetched ONCE per epoch — D2H
        # round-trips are latency-bound (remote backends: ~0.5 s each).
        acc = jnp.zeros(4, jnp.float32)
        total = 0
        nb = 0
        # phase accounting (TGB_TGN_EPOCH_TRACE=1 prints the breakdown):
        # pack = host packer+compact, wait = throttle backpressure,
        # drain = end-of-epoch queue drain + metric D2H
        tm = {"pack": 0.0, "wait": 0.0, "disp": 0.0, "stack": 0.0}
        t_epoch0 = time.perf_counter()
        sanity = self.config.train.sanity_batches
        inflight = []  # completion throttle (train.max_inflight_batches)
        max_inflight = self.config.train.max_inflight_batches
        G = (self.config.train.fuse_steps
             if self._fused_train_step is not None else 1)

        def throttle(handle):
            inflight.append(handle)
            if max_inflight and len(inflight) > max_inflight:
                t0 = time.perf_counter()
                jax.block_until_ready(inflight.pop(0))
                tm["wait"] += time.perf_counter() - t0

        lean = self.device_cache

        def dispatch_one(wire, iw, acc):
            self.dispatch_count += 1
            sk = self._host_key(self._rng_step)
            self._rng_step += 1
            if lean and self.use_memory:
                (self.params, self.opt_state, self.mem_state, self.sstate,
                 loss, _pos, _neg, acc) = self._train_step(
                    self.params, self.opt_state, self.mem_state,
                    self.sstate, self.feats, wire, sk, acc, iw)
            elif lean:
                (self.params, self.opt_state, self.sstate, loss, _pos,
                 _neg, acc) = self._train_step(
                    self.params, self.opt_state, self.memory, self.sstate,
                    self.feats, wire, sk, acc, iw)
            elif self.use_memory:
                (self.params, self.opt_state, self.mem_state, loss, _pos,
                 _neg, acc) = self._train_step(
                    self.params, self.opt_state, self.mem_state,
                    self._tables, wire, sk, acc, iw)
            else:
                (self.params, self.opt_state, loss, _pos, _neg,
                 acc) = self._train_step(self.params, self.opt_state,
                                         self.memory, self._tables, wire,
                                         sk, acc, iw)
            throttle(loss)
            return acc

        def dispatch_group(wires_list, iw, acc):
            self.dispatch_count += 1
            t0 = time.perf_counter()
            if self._wire_blob:
                stacked, layout = blob_stack(wires_list)
                iw = (iw, layout)
            else:
                stacked = stack_wires(wires_list)
            tm["stack"] += time.perf_counter() - t0
            sk = self._host_key(self._rng_step)
            self._rng_step += len(wires_list)
            if lean and self.use_memory:
                (self.params, self.opt_state, self.mem_state, self.sstate,
                 acc, handle) = self._fused_train_step(
                    self.params, self.opt_state, self.mem_state,
                    self.sstate, self.feats, stacked, sk, acc, iw)
            elif lean:
                (self.params, self.opt_state, self.sstate, acc,
                 handle) = self._fused_train_step(
                    self.params, self.opt_state, self.memory, self.sstate,
                    self.feats, stacked, sk, acc, iw)
            elif self.use_memory:
                (self.params, self.opt_state, self.mem_state, acc,
                 handle) = self._fused_train_step(
                    self.params, self.opt_state, self.mem_state,
                    self._tables, stacked, sk, acc, iw)
            else:
                (self.params, self.opt_state, acc,
                 handle) = self._fused_train_step(
                    self.params, self.opt_state, self.memory, self._tables,
                    stacked, sk, acc, iw)
            throttle(handle)
            return acc

        # Group consecutive SAME-SHAPE wires into one fused dispatch;
        # stragglers (shape-bucket growth, epoch tail) go per-batch.
        # Dispatch order always equals pack order — the host packer is
        # stateful and the device memory stream must follow it.
        pending = []
        pend_key = None
        it = self._prefetch("train")
        while True:
            t0 = time.perf_counter()
            nxt = next(it, None)
            tm["pack"] += time.perf_counter() - t0
            if nxt is None:
                break
            lo, hi, wire, iw = nxt
            if sanity and nb >= sanity:
                # debug short-circuit (reference epoch_utils.py:188-192)
                break
            nb += 1
            total += hi - lo
            self._step += 1
            t0 = time.perf_counter()
            if G > 1:
                key = _wire_key(iw, wire)
                if pending and key != pend_key:
                    for w in pending:
                        acc = dispatch_one(w, pend_iw, acc)
                    pending = []
                pend_key = key
                pend_iw = iw
                pending.append(wire)
                if len(pending) == G:
                    acc = dispatch_group(pending, iw, acc)
                    pending = []
            else:
                acc = dispatch_one(wire, iw, acc)
            tm["disp"] += time.perf_counter() - t0
        t0 = time.perf_counter()
        for w in pending:
            acc = dispatch_one(w, pend_iw, acc)
        tm["disp"] += time.perf_counter() - t0
        # Stats resolve lazily: the D2H copy starts now (behind the queued
        # device work) but only blocks when a key is first read, so a
        # pipelined caller never pays the tunnel round-trip per epoch.
        stats = EpochStats(acc, total)
        # host-phase breakdown of this epoch (SURVEY.md §5.1): packing vs
        # dispatch vs backpressure waits; bench.py reports it per epoch
        self.last_epoch_trace = {
            "total_s": time.perf_counter() - t_epoch0,
            "pack_s": tm["pack"], "disp_s": tm["disp"],
            "wait_s": tm["wait"], "stack_s": tm["stack"], "batches": nb,
        }
        if _EPOCH_TRACE:
            print(f"[epoch-trace] total={self.last_epoch_trace['total_s']:.3f}s "
                  f"pack={tm['pack']:.3f}s disp={tm['disp']:.3f}s "
                  f"(stack={tm['stack']:.3f}s) "
                  f"wait={tm['wait']:.3f}s batches={nb} "
                  f"(stats fetch deferred)", flush=True)
        return stats

    def evaluate(self, split: str = "val") -> float:
        d = self.data
        ns = d.val_ns if split == "val" else d.test_ns
        if ns is None:
            raise ValueError(f"no fixed negatives for split '{split}'")
        fixed = FixedNegatives(ns, mode=self.config.train.eval_neg_mode)
        B = self.config.train.batch_size
        active, nb_bucket = self._eval_unique_active(split, ns, B)
        if active:
            return self._evaluate_unique(split, fixed, B, nb_bucket)
        acc = jnp.zeros(2, jnp.float32)
        inflight = []
        max_inflight = self.config.train.max_inflight_batches
        G = (self.config.train.fuse_steps
             if self._fused_eval_step is not None else 1)

        def throttle(handle):
            inflight.append(handle)
            if max_inflight and len(inflight) > max_inflight:
                jax.block_until_ready(inflight.pop(0))

        lean = self.device_cache

        def dispatch_chunk(wire, iw, opt, pes, advance=True, neg_mask=None):
            self.dispatch_count += 2        # fwd + score
            if lean and self.use_memory:
                embed, self.mem_state, self.sstate = self._eval_fwd(
                    self.params, self.mem_state, self.sstate, self.feats,
                    wire, iw, advance)
            elif lean:
                embed, self.sstate = self._eval_fwd(
                    self.params, self.memory, self.sstate, self.feats,
                    wire, iw, advance)
            elif self.use_memory:
                embed, self.mem_state = self._eval_fwd(
                    self.params, self.mem_state, self._tables, wire, iw)
            else:
                embed = self._eval_fwd(self.params, self.memory,
                                       self._tables, wire, iw)
            pos, opt, pes = self._eval_score(self.params, embed, wire,
                                             opt, pes, neg_mask)
            throttle(pos)
            return opt, pes

        def dispatch_chunks(pend, pend_masks, iw, opt, pes):
            """Fused (≥2 chunks, one lax.scan dispatch) or single; never
            the stream-advancing LAST chunk."""
            if len(pend) == 1:
                return dispatch_chunk(pend[0], iw, opt, pes,
                                      advance=False,
                                      neg_mask=pend_masks[0])
            self.dispatch_count += 1
            stacked = stack_wires(pend)
            masks = (None if pend_masks[0] is None
                     else np.stack(pend_masks))
            if lean and self.use_memory:
                self.mem_state, opt, pes, handle = self._fused_eval_step(
                    self.params, self.mem_state, self.sstate, self.feats,
                    stacked, masks, opt, pes, iw)
            elif lean:
                opt, pes, handle = self._fused_eval_step(
                    self.params, self.memory, self.sstate, self.feats,
                    stacked, masks, opt, pes, iw)
            elif self.use_memory:
                self.mem_state, opt, pes, handle = self._fused_eval_step(
                    self.params, self.mem_state, self._tables, stacked,
                    masks, opt, pes, iw)
            else:
                opt, pes, handle = self._fused_eval_step(
                    self.params, self.memory, self._tables, stacked,
                    masks, opt, pes, iw)
            throttle(handle)
            return opt, pes

        opt = pes = None
        pend = []
        pend_masks = []
        pend_key = pend_iw = None
        for (lo, hi, first, last, mask_c, wire,
             iw) in self._eval_packed_chunks(split, fixed, B):
            if first:
                opt = jnp.zeros(B, jnp.int32)
                pes = jnp.zeros(B, jnp.int32)
                pend, pend_masks = [], []
                pend_key = pend_iw = None
            if not last and G > 1:
                key = (_wire_key(iw, wire), mask_c is None)
                if pend and key != pend_key:
                    opt, pes = dispatch_chunks(pend, pend_masks,
                                               pend_iw, opt, pes)
                    pend, pend_masks = [], []
                pend_key, pend_iw = key, iw
                pend.append(wire)
                pend_masks.append(mask_c)
                if len(pend) == G:
                    opt, pes = dispatch_chunks(pend, pend_masks, iw,
                                               opt, pes)
                    pend, pend_masks = [], []
                continue
            if pend:
                opt, pes = dispatch_chunks(pend, pend_masks, pend_iw,
                                           opt, pes)
                pend, pend_masks = [], []
            # the LAST chunk advances stream state -> per-chunk path
            opt, pes = dispatch_chunk(wire, iw, opt, pes,
                                      neg_mask=mask_c)
            if last:
                self.dispatch_count += 1
                valid = jnp.asarray(np.arange(B) < (hi - lo))
                acc = self._eval_finalize(acc, opt, pes, valid)
        try:
            acc.copy_to_host_async()    # overlap D2H RTT with queue drain
        except Exception:
            pass    # optimization hint only; some backends raise
                    # RuntimeError on sharded arrays (ADVICE.md r1)
        vals = np.asarray(acc)                           # ONE fetch
        return float(vals[0] / max(vals[1], 1.0))

    def fit(self, epochs: Optional[int] = None, log=print,
            eval_every: int = 1,
            early_stop: Optional[EarlyStopMonitor] = None,
            checkpoint_dir: Optional[str] = None,
            checkpoint_every: int = 0,
            log_dir: Optional[str] = None,
            val_snapshot: bool = False) -> Dict[str, list]:
        """Epoch driver mirroring reference pyg-mem-tgn.py:53-67, with the
        early-stopping/checkpoint machinery the reference ships but never
        wires in (modules/early_stopping.py; SURVEY.md §5.4) and
        structured jsonl metrics (utils/metrics.py, SURVEY.md §5.5)."""
        from ..utils.metrics import MetricsLogger
        metrics = MetricsLogger(log_dir)
        if not getattr(self, "_warmed", False):
            self.warm_buckets()          # one-time, host-only (~0.5 s)
            self._warmed = True
        epochs = epochs or self.config.train.epoch
        history = {"loss": [], "val": [], "train_s": [], "val_s": []}
        start = time.time()
        # epochs counts epochs to run NOW; labels/checkpoint names continue
        # from the resume cursor (load_checkpoint restores self._epoch)
        e0 = self._epoch
        for e in range(e0, e0 + epochs):
            t0 = time.time()
            stats = self.train_epoch()
            loss = stats["loss"]    # blocks: drain + metrics D2H complete
            self._epoch = e + 1
            t1 = time.time()
            log(f"Epoch: {e + 1:02d}, Loss: {stats['loss']:.4f}, "
                f"AP: {stats['ap']:.4f}, AUC: {stats['auc']:.4f}, "
                f"Training elapsed Time (s): {t1 - t0: .4f}")
            history["loss"].append(stats["loss"])
            history["train_s"].append(t1 - t0)
            metrics.log("train_epoch", epoch=e + 1, loss=stats["loss"],
                        ap=stats["ap"], auc=stats["auc"],
                        events=stats["events"], seconds=round(t1 - t0, 4),
                        events_per_s=round(stats["events"]
                                           / max(t1 - t0, 1e-9), 1))
            val = None
            if (e + 1) % eval_every == 0 and self.data.val_ns is not None:
                t0 = time.time()
                # val_snapshot protects training from the streaming
                # eval's state mutations (clocks advance through val in
                # the reference protocol, pyg-mem-tgn.py:54-63; the
                # snapshot/restore option is SURVEY.md §7.5's fix)
                snap = self.snapshot_stream() if val_snapshot else None
                val = self.evaluate("val")
                if snap is not None:
                    self.restore_stream(snap)
                t1 = time.time()
                log(f"Validation {self.data.eval_metric}: {val: .4f}, "
                    f"elapsed Time (s): {t1 - t0: .4f}")
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
                        self._restore_model_state(early_stop.load_best(
                            self._model_state()))
                    break
        log(f"Execution Time: {time.time() - start:.6f} seconds")
        metrics.close()
        return history

    # ------------------------------------------------- stream snapshots
    def snapshot_stream(self):
        """Backup ALL streaming state: host packer state (cache/clocks/
        mail ring or lean mail ring), device stream state (device-cache
        mode) and the node memory.  This is the val→test memory-carry /
        state-protection API the reference ships but never wires in
        (backup_memory/restore_memory, model_utils.py:290-308; SURVEY.md
        §5.4) — e.g. snapshot before a validation pass so the streaming
        eval's state mutations don't leak into training."""
        snap = {"packer": self.packer.snapshot()}
        if self.device_cache:
            snap["sstate"] = jax.tree.map(jnp.array, self.sstate)
        if self.use_memory:
            snap["mem_state"] = jax.tree.map(jnp.array, self.mem_state)
        return snap

    def restore_stream(self, snap) -> None:
        """Restore a snapshot_stream() backup (copies — the snapshot
        stays valid; restored buffers may be donated by later steps)."""
        self.packer.restore(snap["packer"])
        if self.device_cache:
            self.sstate = jax.tree.map(jnp.array, snap["sstate"])
        if self.use_memory:
            self.mem_state = jax.tree.map(jnp.array, snap["mem_state"])

    # -------------------------------------------------------- checkpointing
    def _model_state(self):
        """Learnable state only (the reference monitor checkpoints model
        state_dicts, modules/early_stopping.py:68-77)."""
        return {"params": self.params}

    def _restore_model_state(self, state) -> None:
        self.params = jax.tree.map(jnp.asarray, state["params"])

    def _full_state(self):
        """Everything needed for deterministic resume (SURVEY.md §5.3):
        learnables, optimizer, device memory state, host stream state,
        RNG and cursors."""
        st = {
            "params": self.params,
            "opt_state": self.opt_state,
            # typed keys serialize as their raw data (impl is config)
            "rng": jax.random.key_data(self._rng),
            "rng_step": np.int64(self._rng_step),
            "neg_rng": rng_state_to_array(self.neg_sampler.rng),
            "step": np.int64(self._step),
            "epoch": np.int64(self._epoch),
        }
        if self.device_cache:
            st["packer"] = {"mail_ptr": self.packer.mail_ptr}
            st["sstate"] = self.sstate
        else:
            st["packer"] = {
                "cache_nbr": self.packer.cache_nbr,
                "cache_eid": self.packer.cache_eid,
                "cache_t": self.packer.cache_t,
                "clock": self.packer.clock,
                "cur_e_id": np.int64(self.packer.cur_e_id),
                "mail_ptr": self.packer.mail_ptr,
            }
        if self.use_memory:
            st["mem_state"] = self.mem_state
        return st

    def save_checkpoint(self, path: str) -> None:
        import os
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        save_pytree(path, self._full_state())

    def load_checkpoint(self, path: str) -> None:
        st = load_pytree(path, self._full_state())
        self.params = jax.tree.map(jnp.asarray, st["params"])
        self.opt_state = jax.tree.map(jnp.asarray, st["opt_state"])
        self._rng = jax.random.wrap_key_data(jnp.asarray(st["rng"]),
                                             impl=self._rng_impl)
        self._base_kd = np.asarray(st["rng"])
        # old checkpoints lack rng_step: seed it from the step counter so
        # a resumed run continues a non-repeating key schedule instead of
        # re-deriving the early per-step keys (ADVICE r3)
        self._rng_step = int(st.get("rng_step", st["step"]))
        self.neg_sampler.rng = rng_state_from_array(st["neg_rng"])
        self._step = int(st["step"])
        self._epoch = int(st["epoch"])
        pk = st["packer"]
        if self.device_cache:
            self.packer.mail_ptr = np.asarray(pk["mail_ptr"])
            self.sstate = jax.tree.map(jnp.asarray, st["sstate"])
            if self.use_memory:
                self.mem_state = jax.tree.map(jnp.asarray,
                                              st["mem_state"])
            return
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
            self.mem_state = jax.tree.map(jnp.asarray, st["mem_state"])
