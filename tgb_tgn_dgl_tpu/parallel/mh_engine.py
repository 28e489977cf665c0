"""MultiHostEngine — epoch driver for N-host temporal-stream training
with the REAL mailbox memory (SURVEY.md §5.7 + §7 phase 5; VERDICT r3
item 1 integration).

Ties the multi-host primitives (parallel/multihost.py) into a drivable
engine: per super-batch of ``n_hosts × batch_size`` events, each host
range packs against the super-batch-start state, mail slots are
re-planned serially (replan_mail_slots), the per-range wires compose
into ONE offset/concatenated wire, a single SPMD step trains on the
whole super-batch (build_composed_memory_step's sequential state chain
keeps the memory evolution bit-serial), and the exchange restores exact
serial packer state for the next super-batch.

Deployment mapping:

  * single process, n chips (the common TPU-slice topology): this class
    IS the driver — the composed wire is dp-sharded over the mesh, each
    "host" range living on its own shard group;
  * one process per host: the same per-super-batch steps run with
    ``multihost_allgather`` for the event exchange and
    ``make_process_global_wire`` assembling the global wire from each
    process's local offset wire (tests/test_multihost.py's two-process
    worker shows the plumbing).

Everything OUTSIDE train_epoch — evaluate (the TGB chunked-negative
protocol), fit with early stopping/checkpoints/metrics, warm_buckets,
snapshot/checkpoint — is inherited from engine/train.Engine unchanged:
the exchange invariant guarantees the packer/memory state at every
super-batch boundary equals a serial engine's, so the single-host
machinery operates on it directly.  The epoch's tail (fewer than
n_hosts×B remaining events) trains through the inherited single-host
step — serial semantics, no padding waste.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..engine.train import Engine
from ..utils.config import FrameworkConfig
from .multihost import (SuperBatchExchanger, _encode,
                        build_composed_memory_step, concat_offset_wires,
                        partition_super_batch, replan_mail_slots)


def build_composed_frozen_step(model_cfg, optimizer, K: int, IW: int,
                               N: int, jit: bool = True):
    """Composed super-batch step for the frozen-memory (reference-
    parity) path: one forward/backward/Adam over the concatenated wire —
    no state chain needed (loss/grads equal the mean of the per-host
    values, tests/test_multihost.py::test_composed_super_batch_step...)."""
    import jax
    import optax

    from ..models.tgnn import bce_loss, tgnn_forward
    from ..ops.wire import expand_wire

    def step(params, opt_state, memory, feats, wire, rng):
        pack = expand_wire(wire, K, IW, N)

        def loss_fn(p):
            pos, neg = tgnn_forward(p, model_cfg, memory, feats, pack,
                                    train=True, rng=rng)
            return bce_loss(pos, neg, pack.ev_valid), (pos, neg)

        (loss, (pos, neg)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, pos, neg

    if jit:
        import jax
        return jax.jit(step, donate_argnums=(1,))
    return step


class MultiHostEngine(Engine):
    """N-host super-batch training driver (see module docstring).

    Requires a fixed ``train.max_intra_block`` (stable composed jit
    signature) and ``train.wire_dedup=False`` semantics for the composed
    path — the full WirePack is what offsets/concatenates; the inherited
    eval path keeps whatever wire format the config selects."""

    def __init__(self, data, config: FrameworkConfig, n_hosts: int,
                 mesh=None, exchange: str = "replicated"):
        assert n_hosts >= 1
        assert exchange in ("replicated", "owned")
        assert config.train.max_intra_block is not None, (
            "MultiHostEngine needs a fixed train.max_intra_block")
        super().__init__(data, config)
        self.n_hosts = n_hosts
        self.mesh = mesh
        self.exchange = exchange
        if exchange == "owned":
            # Node-range-owned state maintenance (SURVEY.md §7 phase 5):
            # each range's authoritative cache/clock/mail rows live with
            # their owner; packs read boundary-gathered rows on a
            # borrowed scratch packer (parallel/owned_state.py).  Host
            # work per host is O(events/n) + gathers instead of the
            # replicated exchange's O(events) replay (BASELINE.md
            # "multi-host host-work scaling").
            from ..data.packer import PackerConfig, StreamPacker
            from .owned_state import (NativeNodeRangeOwnedState,
                                      NodeRangeOwnedState,
                                      native_available)
            K = config.sampling.num_neighbors
            S = config.memory.mailbox_size
            owner_cls = (NativeNodeRangeOwnedState if native_available()
                         else NodeRangeOwnedState)
            self._owners = [owner_cls(data.num_nodes, n_hosts, h, K, S)
                            for h in range(n_hosts)]
            pk_cfg = PackerConfig(
                num_neighbors=K, batch_size=config.train.batch_size,
                max_intra_block=config.train.max_intra_block,
                mailbox_size=S, seed=config.train.seed)
            from ..data.native_packer import make_stream_packer
            self._scratch = make_stream_packer(data.num_nodes, pk_cfg)
            if not getattr(self._scratch, "rows_api_available",
                           lambda: False)():
                self._scratch = StreamPacker(data.num_nodes, pk_cfg)
            # share the sticky-bucket table so scratch packs land in the
            # same shape buckets as the serial/tail path (compose
            # invariant + one compiled signature)
            if hasattr(self.packer, "_sticky"):
                self._scratch._sticky = self.packer._sticky
        K = config.sampling.num_neighbors
        IW = config.train.max_intra_block
        N = data.num_nodes
        if self.use_memory and self.eager_memory:
            # DyRep: eager mail embeds event partners, so the per-range
            # pipeline (apply → embed → messages → commit) chains
            # sequentially inside one program over STACKED (not
            # offset-composed) per-range wires (build_composed_dyrep_step)
            from .multihost import build_composed_dyrep_step
            self._composed_step = build_composed_dyrep_step(
                self.model_cfg, self.mem_cfg, self.optimizer, K, IW, N,
                n_hosts, jit=self._jit)
        elif self.use_memory:
            self._composed_step = build_composed_memory_step(
                self.model_cfg, self.mem_cfg, self.optimizer, K, IW, N,
                n_hosts, jit=self._jit, arch=self.arch)
        else:
            self._composed_step = build_composed_frozen_step(
                self.model_cfg, self.optimizer, K, IW, N, jit=self._jit)
        # per-super-batch device metrics: [Σ loss·n, Σ ap, Σ auc, count]
        import jax
        import jax.numpy as jnp

        from ..engine.evaluator import jnp_ap_auc

        def metrics(acc, loss, pos, neg, valid):
            n = valid.sum()
            neg1 = neg if neg.ndim == 1 else neg[:, 0]
            ap, auc = jnp_ap_auc(jax.nn.sigmoid(pos),
                                 jax.nn.sigmoid(neg1), valid)
            return acc + jnp.stack([loss.astype(jnp.float32) * n, ap,
                                    auc, jnp.float32(1.0)])

        self._sb_metrics = jax.jit(metrics, donate_argnums=(0,)) \
            if self._jit else metrics

    def _place_composed(self, wire):
        if self.mesh is None:
            return wire
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(self.mesh, P("dp"))
        return jax.tree.map(
            lambda a: None if a is None
            else jax.device_put(np.asarray(a), sh), wire,
            is_leaf=lambda x: x is None)

    def train_epoch(self, host_only: bool = False,
                    max_super_batches: Optional[int] = None):
        """One multi-host epoch.  ``host_only=True`` runs the REAL host
        path (per-range packs, state exchange, mail re-plan, wire
        compose) but skips every device dispatch — the measurement mode
        bench.py uses to record the per-host host-work economics
        (owned vs replicated crossover, BASELINE.md) without paying a
        composed-step XLA compile on tunneled backends.
        ``max_super_batches`` caps the loop for the same purpose."""
        import jax
        import jax.numpy as jnp

        from ..models.memory import init_memory_state

        d = self.data
        if not getattr(self, "_warmed", False):
            # equal shape buckets across ranges are a compose invariant
            self.warm_buckets()
            self._warmed = True
        self.packer.reset_cache()
        owned = self.exchange == "owned"
        if owned:
            # owners pick up the serial state (clocks persist across
            # epochs; the tail/eval phases advanced self.packer)
            for ow in self._owners:
                ow.reset_cache()
                ow.load_from_serial(self.packer)
        if self.use_memory:
            if self.eager_memory:
                from ..models.variants import init_eager_memory_state
                self.mem_state = init_eager_memory_state(
                    self.mem_cfg, self.config.memory.mailbox_size)
            else:
                self.mem_state = init_memory_state(self.mem_cfg)
        rows_all = self._rows["train"]
        blocks_all = self.blocks_for("train")
        B = self.config.train.batch_size
        n = self.n_hosts
        sb = n * B
        n_full = (len(rows_all) // sb) * sb
        acc = jnp.zeros(4, jnp.float32)
        total = 0
        import time as _time
        # real host-phase trace (VERDICT r4 weak-3: the design question
        # on this path is "is host work the binding wall at n hosts" —
        # the trace must answer it, not hardcode zeros): pack = per-range
        # packing (scratch or replicated), exchange = state maintenance
        # (owner applies + gathers / replicated replay), replan = mail
        # re-plan, stack = wire compose + device placement, disp =
        # composed-step + metrics dispatch.
        tm = {"pack": 0.0, "pack_tail": 0.0, "disp": 0.0, "stack": 0.0,
              "exchange": 0.0, "replan": 0.0}
        t0_epoch = _time.perf_counter()
        n_sb = 0
        for lo in range(0, n_full, sb):
            if max_super_batches is not None and n_sb >= max_super_batches:
                break
            n_sb += 1
            ranges = partition_super_batch(lo, lo + sb, n, B)
            if owned:
                from .owned_state import (gather_mail,
                                          pack_with_gathered_state)
                batches, wires = [], []
                for r in ranges:
                    idx = rows_all[r.lo:r.hi]
                    src, dst, t = d.src[idx], d.dst[idx], d.t[idx]
                    neg = self.neg_sampler.sample(dst)
                    blk = blocks_all[r.lo:r.hi]
                    batches.append((src, dst, t, idx, neg, blk))
                    # host r.host's local view: super-batch-start OWNER
                    # state via boundary gathers (bounded staleness —
                    # owners advance only after every range packed)
                    t0 = _time.perf_counter()
                    w, _, _ = pack_with_gathered_state(
                        self._scratch, self._owners, src, dst, t, idx,
                        blk, neg)
                    tm["pack"] += _time.perf_counter() - t0
                    wires.append(w)
                # mail slot re-plan reads the super-batch-start ring
                # pointers of the write nodes (owner-authoritative)
                t0 = _time.perf_counter()
                wr = np.unique(np.concatenate(
                    [np.concatenate([b[0], b[1]]) for b in batches]
                ).astype(np.int64))
                ptrs, _ = gather_mail(self._owners, wr)
                ptr0 = np.zeros(d.num_nodes, np.int64)
                ptr0[wr] = ptrs
                # authoritative state advance, stream order, O(1/n) heavy
                # work per owner
                for src, dst, t, idx, neg, blk in batches:
                    for ow in self._owners:
                        ow.apply_batch(src, dst, t, blk, neg, e_id=idx)
                tm["exchange"] += _time.perf_counter() - t0
                batches = [b[:5] for b in batches]
            else:
                t0 = _time.perf_counter()
                snap = self.packer.snapshot()
                ptr0 = np.asarray(self.packer.mail_ptr).copy()
                tm["exchange"] += _time.perf_counter() - t0
                batches, wires = [], []
                for r in ranges:
                    idx = rows_all[r.lo:r.hi]
                    src, dst, t = d.src[idx], d.dst[idx], d.t[idx]
                    neg = self.neg_sampler.sample(dst)
                    blk = blocks_all[r.lo:r.hi]
                    batches.append((src, dst, t, idx, neg))
                    # host r.host's local view: super-batch-start state
                    # (bounded staleness — it cannot see sibling ranges)
                    t0 = _time.perf_counter()
                    self.packer.restore(snap)
                    w, _ = self.packer.pack_wire(src, dst, t, idx, blk,
                                                 neg)
                    tm["pack"] += _time.perf_counter() - t0
                    wires.append(w)
                # restore serial state for the NEXT super-batch: host=-1
                # treats every range as remote (cache inserts + clock
                # replay + mail advance over the whole super-batch in
                # stream order)
                t0 = _time.perf_counter()
                self.packer.restore(snap)
                payloads = [_encode(*b) for b in batches]
                SuperBatchExchanger(self.packer, -1, n,
                                    allgather=lambda _p: payloads
                                    ).exchange(*batches[0])
                tm["exchange"] += _time.perf_counter() - t0
            if self.use_memory:
                t0 = _time.perf_counter()
                plans, _ = replan_mail_slots(
                    [b[0] for b in batches], [b[1] for b in batches],
                    ptr0, self.config.memory.mailbox_size, B)
                tm["replan"] += _time.perf_counter() - t0
                t0 = _time.perf_counter()
                if self.eager_memory:
                    # DyRep: STACK the serially re-planned per-range
                    # wires (leading n) — the chained composed step
                    # expands each range standalone, no offset compose
                    from ..ops.wire import stack_wires
                    from .multihost import align_wires, apply_mail_plan
                    ws = [apply_mail_plan(w, pl, d.num_nodes)
                          for w, pl in zip(wires, plans)]
                    gw = stack_wires(align_wires(ws))
                else:
                    gw = concat_offset_wires(wires, mail_plans=plans,
                                             num_nodes=d.num_nodes)
            else:
                t0 = _time.perf_counter()
                gw = concat_offset_wires(wires)
            if not (self.use_memory and self.eager_memory):
                gw = self._place_composed(gw)
            tm["stack"] += _time.perf_counter() - t0
            if host_only:
                total += sb
                continue
            sk = self._host_key(self._rng_step)
            self._rng_step += 1             # one composed program = 1 step
            self.dispatch_count += 2        # step + metrics
            t0 = _time.perf_counter()
            if self.use_memory:
                (self.params, self.opt_state, self.mem_state, loss, pos,
                 neg_l) = self._composed_step(
                    self.params, self.opt_state, self.mem_state,
                    self.feats, gw, sk)
            else:
                self.params, self.opt_state, loss, pos, neg_l = \
                    self._composed_step(self.params, self.opt_state,
                                        self.memory, self.feats, gw, sk)
            # full super-batches only reach this path: every range is
            # a complete batch, so every composed event row is real
            valid = jnp.ones(sb, bool)
            acc = self._sb_metrics(acc, loss, pos, neg_l, valid)
            tm["disp"] += _time.perf_counter() - t0
            total += sb
            self._step += n
        # owned mode: hand the serial packer back its full state (one
        # O(N) gather per epoch) so the tail and the inherited
        # eval/checkpoint/snapshot machinery operate on exact serial
        # state; owners re-seed from it at the next epoch start
        if owned:
            from .owned_state import restore_serial_from_owners
            t0 = _time.perf_counter()
            restore_serial_from_owners(self.packer, self._owners)
            tm["exchange"] += _time.perf_counter() - t0
        # epoch tail: fewer than n*B events — inherited single-host
        # serial step (state stays exact; no composed padding waste).
        # Measurement modes skip it (host_only has no device steps;
        # a capped loop leaves the stream cursor mid-epoch).
        if host_only or max_super_batches is not None:
            n_full = len(rows_all)
        if n_full < len(rows_all):
            for idx_lo in range(n_full, len(rows_all), B):
                idx = rows_all[idx_lo:idx_lo + B]
                src, dst, t = d.src[idx], d.dst[idx], d.t[idx]
                neg = self.neg_sampler.sample(dst)
                blk = blocks_all[idx_lo:idx_lo + B]
                t0 = _time.perf_counter()
                wire, iw = self.packer.pack_wire(src, dst, t, idx, blk,
                                                 neg)
                wire = self._maybe_compact(wire, iw)
                # tail batches are packed SERIALLY on every host (the
                # leftover < n·B events have no range split), so their
                # pack time must not be divided by n in host_s below
                tm["pack_tail"] += _time.perf_counter() - t0
                sk = self._host_key(self._rng_step)
                self._rng_step += 1
                self.dispatch_count += 1
                t0 = _time.perf_counter()
                if self.use_memory:
                    (self.params, self.opt_state, self.mem_state, _l,
                     _p, _n, acc) = self._train_step(
                        self.params, self.opt_state, self.mem_state,
                        self._tables, wire, sk, acc, iw)
                else:
                    (self.params, self.opt_state, _l, _p, _n,
                     acc) = self._train_step(
                        self.params, self.opt_state, self.memory,
                        self._tables, wire, sk, acc, iw)
                tm["disp"] += _time.perf_counter() - t0
                total += len(idx)
                self._step += 1
        from ..engine.train import EpochStats
        self.last_epoch_trace = {
            "total_s": _time.perf_counter() - t0_epoch,
            "pack_s": tm["pack"] + tm["pack_tail"], "disp_s": tm["disp"],
            "wait_s": 0.0,
            "stack_s": tm["stack"], "exchange_s": tm["exchange"],
            "replan_s": tm["replan"],
            # host work a per-host deployment pays per epoch: super-batch
            # packing parallelizes per range by construction (÷ n), but
            # the serial epoch TAIL (< n·B leftover events) and the
            # exchange/replan/compose phases run on every host in full
            "host_s": (tm["pack"] / max(n, 1) + tm["pack_tail"]
                       + tm["exchange"] + tm["replan"] + tm["stack"]),
            "batches": total // max(B, 1),
            "super_batches": n_sb,
        }
        return EpochStats(acc, total)
