"""Node-range-owned streaming state — the scalable multi-host state
maintenance design (SURVEY.md §7 phase 5; VERDICT r3 item 5).

The shipped super-batch exchange (parallel/multihost.py) keeps every
host's packer state FULLY REPLICATED: each host replays all N_hosts
ranges of every super-batch, so per-host state-maintenance cost is
O(total events) — flat in the number of hosts.  This module is the
owner-partitioned alternative: host h maintains cache/clock/mail rows
ONLY for its node range, processing only the events that touch owned
nodes; rows another host needs at pack time travel in a boundary
exchange (an all_to_all of requested rows).

Why this is EXACT by construction: all three streaming-state components
are *per-node* functions of the event stream —

  * cache row of node u  = last-K-by-e_id merge over events with u as an
    endpoint (reference neighbor_loader.py:52-104) — no other node's
    state involved;
  * clock[u]             = t of the last write touching u in the serial
    block order (negatives → dst → src per block,
    model_utils.py:77-83), or the global batch max under the eval wipe;
  * mail_ptr[u]          = per-batch advance by min(#touches(u), S).

So partitioning rows by owner loses nothing; the serial oracle equality
is proven row-for-row in tests/test_owned_state.py.  What ownership
buys: the O(K)-merge work per host drops from O(total touches) to
O(owned touches) ≈ total/N_hosts (+ a cheap vectorized scan to filter),
at the price of a pack-time boundary read of ~(roots × K) rows.  The
cost model and the measured crossover vs the replicated exchange are in
BASELINE.md ("multi-host host-work scaling").

The module ships the full stack:

  * NodeRangeOwnedState (numpy oracle) / NativeNodeRangeOwnedState
    (csrc/owned_state.cpp, ~0.05 µs per stream event per host);
  * pack_with_gathered_state — pack a batch against owner state via a
    borrowed scratch packer filled from boundary gathers, bit-exact vs
    a full-state serial pack (row-level state surgery in
    csrc/packer.cpp);
  * DistributedOwnerExchange — the same gathers across REAL processes
    with two allgather collective rounds (tests/test_owned_distributed.py);
  * MultiHostEngine(exchange='owned') drives an epoch end-to-end with
    bit-identical training vs the replicated exchange
    (tests/test_mh_engine.py).
"""
from __future__ import annotations

import ctypes
from typing import Sequence, Tuple

import numpy as np

_DECLARED = False


def _owned_lib():
    """libhostops.so with the owned_state C API declared, or None."""
    from ..data import hostops

    lib = hostops._load()
    if lib is None or not hasattr(lib, "owned_new"):
        return None
    global _DECLARED
    if not _DECLARED:
        c = ctypes
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.owned_new.argtypes = [c.c_int64, c.c_int64, c.c_int64,
                                  c.c_int32, c.c_int32]
        lib.owned_new.restype = c.c_void_p
        lib.owned_free.argtypes = [c.c_void_p]
        lib.owned_apply_batch.argtypes = [
            c.c_void_p, i32p, i32p, f32p, i64p, i32p, i32p,
            c.c_int64, c.c_int64, c.c_int32]
        lib.owned_get_rows.argtypes = [
            c.c_void_p, i64p, c.c_int64, i32p, i64p, f32p, f32p, u8p]
        lib.owned_get_mail.argtypes = [
            c.c_void_p, i64p, c.c_int64, i64p, u8p]
        lib.owned_reset_cache.argtypes = [c.c_void_p]
        lib.owned_load_from_serial.argtypes = [
            c.c_void_p, i32p, i64p, f32p, f32p, i64p]
        lib.owned_get_state.argtypes = [
            c.c_void_p, i32p, i64p, f32p, f32p, i64p,
            c.POINTER(c.c_int64)]
        _DECLARED = True
    return lib


def native_available() -> bool:
    return _owned_lib() is not None


class NodeRangeOwnedState:
    """Host h's authoritative streaming state for nodes [lo, hi).

    API mirrors the state half of data/packer.StreamPacker, filtered to
    the owned range; ``apply_batch`` consumes one batch of the global
    stream (every host sees the same gathered super-batch events, as in
    the existing exchange protocol — the difference is each host only
    does heavy per-node work for its own rows)."""

    def __init__(self, num_nodes: int, n_hosts: int, host: int, K: int,
                 S: int):
        self.N = num_nodes
        self.lo = host * num_nodes // n_hosts
        self.hi = (host + 1) * num_nodes // n_hosts
        n_own = self.hi - self.lo
        self.K = K
        self.S = S
        self.cache_nbr = np.zeros((n_own, K), np.int32)
        self.cache_eid = np.full((n_own, K), -1, np.int64)
        self.cache_t = np.full((n_own, K), -1.0, np.float32)
        self.clock = np.zeros(n_own, np.float32)
        self.mail_ptr = np.zeros(n_own, np.int64)
        # heavy-work meter: per-node cache-merge entries processed (the
        # O(K) merges dominate replicated-replay cost)
        self.merge_entries = 0

    def _own(self, nodes: np.ndarray) -> np.ndarray:
        return (nodes >= self.lo) & (nodes < self.hi)

    def apply_batch(self, src, dst, t, blocks, neg, e_id,
                    eval_mode: bool = False) -> None:
        """Consume one batch of the global stream in serial semantics,
        updating owned rows only.  ``neg`` is (B,) or (B, M)."""
        src = np.asarray(src, np.int64)
        dst = np.asarray(dst, np.int64)
        t = np.asarray(t, np.float32)
        blocks = np.asarray(blocks, np.int64)
        e_id = np.asarray(e_id, np.int64)
        B = len(src)
        if B == 0:
            return
        neg2d = np.asarray(neg, np.int64).reshape(B, -1)
        M = neg2d.shape[1]

        # --- clocks: the serial per-block write order exactly —
        # eval wipe OR negative writes, then dst, then src per block
        # (model_utils.py:77-83); numpy fancy assignment is
        # last-occurrence-wins like the serial packer's.
        def write(nodes, vals):
            own = self._own(nodes)
            self.clock[nodes[own] - self.lo] = vals[own]

        k = int(blocks.max()) + 1
        for i in range(k):
            sel = np.nonzero(blocks == i)[0]
            ti = t[sel]
            if eval_mode:
                if len(ti):
                    self.clock[:] = ti.max()
            else:
                write(neg2d[sel].ravel(), np.repeat(ti, M))
            write(dst[sel], ti)
            write(src[sel], ti)

        # --- mail ring pointers: advance by min(count, S) per owned node
        mn = np.concatenate([src, dst])
        own = self._own(mn)
        uniq, counts = np.unique(mn[own], return_counts=True)
        kept = np.minimum(counts, self.S)
        idx = uniq - self.lo
        self.mail_ptr[idx] = (self.mail_ptr[idx] + kept) % self.S

        # --- cache rows: last-K-by-eid merge for OWNED endpoints only
        # (same candidate order as StreamPacker.insert: dst-half before
        # src-half on equal eid, cache wins ties)
        nodes2 = np.concatenate([dst, src])
        nbrs2 = np.concatenate([src, dst]).astype(np.int32)
        eids2 = np.concatenate([e_id, e_id])
        tt2 = np.concatenate([t, t])
        half = np.concatenate([np.zeros(B, np.int8), np.ones(B, np.int8)])
        own = self._own(nodes2)
        nodes2, nbrs2, eids2, tt2, half = (
            nodes2[own], nbrs2[own], eids2[own], tt2[own], half[own])
        self.merge_entries += len(nodes2)
        order = np.lexsort((half, eids2, nodes2))
        nodes2, nbrs2, eids2, tt2 = (nodes2[order], nbrs2[order],
                                     eids2[order], tt2[order])
        uniq, starts = np.unique(nodes2, return_index=True)
        ends = np.append(starts[1:], len(nodes2))
        K = self.K
        for u, a, b in zip(uniq, starts, ends):
            r = u - self.lo
            lo2 = max(a, b - K)
            cat_e = np.concatenate([self.cache_eid[r], eids2[lo2:b]])
            cat_n = np.concatenate([self.cache_nbr[r], nbrs2[lo2:b]])
            cat_t = np.concatenate([self.cache_t[r], tt2[lo2:b]])
            top = np.argsort(-cat_e, kind="stable")[:K]
            self.cache_eid[r] = cat_e[top]
            self.cache_nbr[r] = cat_n[top]
            self.cache_t[r] = cat_t[top]

    def get_rows(self, nodes: np.ndarray):
        """(nbr (n,K), eid, t, clock (n,), owned_mask (n,)) for an
        arbitrary node set; rows outside the owned range are zero/-1
        filled with owned_mask False."""
        nodes = np.asarray(nodes, np.int64)
        n = len(nodes)
        K = self.K
        nbr = np.zeros((n, K), np.int32)
        eid = np.full((n, K), -1, np.int64)
        tt = np.full((n, K), -1.0, np.float32)
        clock = np.zeros(n, np.float32)
        m = self._own(nodes)
        idx = nodes[m] - self.lo
        nbr[m] = self.cache_nbr[idx]
        eid[m] = self.cache_eid[idx]
        tt[m] = self.cache_t[idx]
        clock[m] = self.clock[idx]
        return nbr, eid, tt, clock, m

    def get_mail(self, nodes: np.ndarray):
        """(mail_ptr (n,), owned_mask (n,)) for an arbitrary node set."""
        nodes = np.asarray(nodes, np.int64)
        ptr = np.zeros(len(nodes), np.int64)
        m = self._own(nodes)
        ptr[m] = self.mail_ptr[nodes[m] - self.lo]
        return ptr, m

    def reset_cache(self) -> None:
        """Epoch-start reset: cache + mail clear, clocks persist
        (StreamPacker.reset_cache semantics)."""
        self.cache_eid.fill(-1)
        self.cache_t.fill(-1.0)
        self.mail_ptr.fill(0)

    def load_from_serial(self, packer) -> None:
        """Re-seed the owned range from a serial packer's state (after a
        serially-executed phase advanced it, e.g. the eval protocol)."""
        sl = slice(self.lo, self.hi)
        self.cache_nbr[:] = np.asarray(packer.cache_nbr)[sl]
        self.cache_eid[:] = np.asarray(packer.cache_eid)[sl]
        self.cache_t[:] = np.asarray(packer.cache_t)[sl]
        self.clock[:] = np.asarray(packer.clock)[sl]
        self.mail_ptr[:] = np.asarray(packer.mail_ptr)[sl]


class NativeNodeRangeOwnedState:
    """C++ twin of NodeRangeOwnedState (csrc/owned_state.cpp) — same
    API, hot loops native.  The numpy class is the oracle
    (tests/test_owned_state.py::test_native_*)."""

    def __init__(self, num_nodes: int, n_hosts: int, host: int, K: int,
                 S: int):
        lib = _owned_lib()
        assert lib is not None, "libhostops.so lacks owned_state API"
        self._lib = lib
        self.N = num_nodes
        self.lo = host * num_nodes // n_hosts
        self.hi = (host + 1) * num_nodes // n_hosts
        self.K = K
        self.S = S
        self._h = lib.owned_new(num_nodes, self.lo, self.hi, K, S)

    def __del__(self):
        try:
            self._lib.owned_free(self._h)
        except Exception:
            pass

    def apply_batch(self, src, dst, t, blocks, neg, e_id,
                    eval_mode: bool = False) -> None:
        src = np.ascontiguousarray(src, np.int32)
        dst = np.ascontiguousarray(dst, np.int32)
        t = np.ascontiguousarray(t, np.float32)
        blocks = np.ascontiguousarray(blocks, np.int32)
        e_id = np.ascontiguousarray(e_id, np.int64)
        B = len(src)
        if B == 0:
            return
        neg2d = np.ascontiguousarray(np.asarray(neg, np.int32)
                                     .reshape(B, -1))
        self._lib.owned_apply_batch(self._h, src, dst, t, e_id, blocks,
                                    neg2d, B, neg2d.shape[1],
                                    int(eval_mode))

    def get_rows(self, nodes: np.ndarray):
        nodes = np.ascontiguousarray(nodes, np.int64)
        n = len(nodes)
        K = self.K
        nbr = np.zeros((n, K), np.int32)
        eid = np.full((n, K), -1, np.int64)
        tt = np.full((n, K), -1.0, np.float32)
        clock = np.zeros(n, np.float32)
        owned = np.zeros(n, np.uint8)
        if n:
            self._lib.owned_get_rows(self._h, nodes, n, nbr, eid, tt,
                                     clock, owned)
        return nbr, eid, tt, clock, owned.astype(bool)

    def get_mail(self, nodes: np.ndarray):
        nodes = np.ascontiguousarray(nodes, np.int64)
        n = len(nodes)
        ptr = np.zeros(n, np.int64)
        owned = np.zeros(n, np.uint8)
        if n:
            self._lib.owned_get_mail(self._h, nodes, n, ptr, owned)
        return ptr, owned.astype(bool)

    def reset_cache(self) -> None:
        self._lib.owned_reset_cache(self._h)

    def load_from_serial(self, packer) -> None:
        self._lib.owned_load_from_serial(
            self._h,
            np.ascontiguousarray(packer.cache_nbr, np.int32),
            np.ascontiguousarray(packer.cache_eid, np.int64),
            np.ascontiguousarray(packer.cache_t, np.float32),
            np.ascontiguousarray(packer.clock, np.float32),
            np.ascontiguousarray(packer.mail_ptr, np.int64))

    def _dump(self):
        n_own = self.hi - self.lo
        nbr = np.zeros((n_own, self.K), np.int32)
        eid = np.zeros((n_own, self.K), np.int64)
        tt = np.zeros((n_own, self.K), np.float32)
        clock = np.zeros(n_own, np.float32)
        ptr = np.zeros(n_own, np.int64)
        me = ctypes.c_int64(0)
        self._lib.owned_get_state(self._h, nbr, eid, tt, clock, ptr,
                                  ctypes.byref(me))
        return nbr, eid, tt, clock, ptr, int(me.value)

    @property
    def cache_nbr(self):
        return self._dump()[0]

    @property
    def cache_eid(self):
        return self._dump()[1]

    @property
    def cache_t(self):
        return self._dump()[2]

    @property
    def clock(self):
        return self._dump()[3]

    @property
    def mail_ptr(self):
        return self._dump()[4]

    @property
    def merge_entries(self):
        return self._dump()[5]


def gather_rows(owners: Sequence[NodeRangeOwnedState],
                nodes: np.ndarray) -> Tuple[np.ndarray, np.ndarray,
                                            np.ndarray, np.ndarray, int]:
    """Pack-time boundary exchange (simulated all_to_all): assemble
    cache rows + clocks for an arbitrary node set from their owners.

    Returns (cache_nbr (n,K), cache_eid, cache_t, clock (n,), bytes) —
    ``bytes`` is the wire cost a real exchange would ship for the
    REMOTE subset (every row element: nbr i32 + eid i64 + t f32 = 16 B/
    entry + clock 4 B/node), the quantity the BASELINE.md cost model
    charges."""
    nodes = np.asarray(nodes, np.int64)
    n = len(nodes)
    K = owners[0].K
    out_nbr = np.zeros((n, K), np.int32)
    out_eid = np.full((n, K), -1, np.int64)
    out_t = np.full((n, K), -1.0, np.float32)
    out_clock = np.zeros(n, np.float32)
    wire_bytes = 0
    for h, ow in enumerate(owners):
        nbr, eid, tt, clock, m = ow.get_rows(nodes)
        if not m.any():
            continue
        out_nbr[m] = nbr[m]
        out_eid[m] = eid[m]
        out_t[m] = tt[m]
        out_clock[m] = clock[m]
        wire_bytes += int(m.sum()) * (K * 16 + 4)
    return out_nbr, out_eid, out_t, out_clock, wire_bytes


def gather_mail(owners: Sequence, nodes: np.ndarray):
    """Assemble mail ring pointers for an arbitrary node set from their
    owners (the third boundary-exchange round; ~8 B/node)."""
    nodes = np.asarray(nodes, np.int64)
    out = np.zeros(len(nodes), np.int64)
    nbytes = 0
    for ow in owners:
        ptr, m = ow.get_mail(nodes)
        out[m] = ptr[m]
        nbytes += int(m.sum()) * 8
    return out, nbytes


def pack_with_gathered_state(scratch, owners: Sequence, src, dst, t,
                             ev_idx, blocks, neg,
                             eval_mode: bool = False):
    """Pack ONE batch against owner-partitioned authoritative state —
    the owned-mode replacement for packing on a fully replicated
    packer (SURVEY.md §7 phase 5).

    ``scratch`` is a full-N StreamPacker/NativeStreamPacker in the
    DEFAULT state (empty cache, zero clocks/mail) that this function
    borrows: it fills exactly the rows the pack will read with
    boundary-gathered rows, packs with ``insert=False`` (authoritative
    state advances via the owners' ``apply_batch``, proven bit-exact in
    tests/test_owned_state.py), and clears the dirtied rows back to
    defaults — O(gathered) per pack, independent of N.

    The read set is complete by construction: the pack reads cache
    rows + clocks of the batch's roots (unique(src ∪ dst ∪ neg) —
    negatives and intra partners included), clocks of the roots' cache
    neighbors (the Δt denominators), and mail pointers of the write
    nodes (src ∪ dst ⊆ roots); everything else in packer state is
    untouched by a pack.  Returns (wire, intra_width, exchange_bytes)
    where exchange_bytes is what a real all_to_all would ship for the
    three gather rounds."""
    src = np.asarray(src)
    dst = np.asarray(dst)
    neg_arr = np.asarray(neg)
    roots = np.unique(np.concatenate(
        [src.astype(np.int64), dst.astype(np.int64),
         neg_arr.astype(np.int64).ravel()]))
    # round 1: root cache rows + clocks
    nbr, eid, ct, clock_r, b1 = gather_rows(owners, roots)
    # round 2: cache-neighbor clocks (Δt denominators); skip nodes
    # already gathered as roots
    nbr_nodes = np.unique(nbr[eid >= 0].astype(np.int64))
    extra = np.setdiff1d(nbr_nodes, roots, assume_unique=True)
    _, _, _, clock_n, b2 = gather_rows(owners, extra)
    b2 = len(extra) * 4          # a clock-only round ships 4 B/node
    # round 3: mail pointers of the write nodes
    wr_nodes = np.unique(np.concatenate([src, dst]).astype(np.int64))
    mail, b3 = gather_mail(owners, wr_nodes)

    scratch.set_rows(roots, nbr, eid, ct, clock_r)
    scratch.set_clock_rows(extra, clock_n)
    scratch.set_mail_rows(wr_nodes, mail)
    try:
        wire, iw = scratch.pack_wire(src, dst, t, ev_idx, blocks, neg,
                                     eval_mode=eval_mode, insert=False)
    finally:
        dirty = np.unique(np.concatenate([roots, extra, wr_nodes]))
        scratch.clear_rows(dirty, zero_all_clocks=eval_mode)
    return wire, iw, b1 + b2 + b3


def restore_serial_from_owners(packer, owners: Sequence) -> None:
    """Reconstruct a serial packer's full state from the range owners
    (one O(N) gather — used once per epoch at the owned-mode tail
    boundary, parallel/mh_engine.py).  ``cur_e_id`` rebuilds as
    max(cache e_id) + 1: the most recent insert always survives in its
    endpoints' top-K-by-eid rows, so the max is exact."""
    N = owners[-1].hi
    nodes = np.arange(N, dtype=np.int64)
    nbr, eid, ct, clock, _ = gather_rows(owners, nodes)
    mail, _ = gather_mail(owners, nodes)
    cur = int(eid.max()) + 1 if eid.size and eid.max() >= 0 else 0
    if hasattr(packer, "load_state"):            # native packer
        packer.load_state(nbr, eid, ct, clock, cur, mail)
    else:
        packer.cache_nbr[:] = nbr
        packer.cache_eid[:] = eid
        packer.cache_t[:] = ct
        packer.clock[:] = clock
        packer.mail_ptr[:] = mail
        packer.cur_e_id = cur


class DistributedOwnerExchange:
    """Cross-PROCESS boundary-row resolution (SURVEY.md §7 phase 5's
    all_to_all design): each process holds ONE NodeRangeOwnedState
    shard; ``get_rows``/``get_mail`` for an arbitrary node set resolve
    with two collective rounds over an injected ``allgather``
    (multihost.multihost_allgather over DCN in a real jax.distributed
    run; a local closure in tests):

      round A — all hosts allgather their REQUEST node lists;
      round B — every host answers every request with the rows it owns
      (request positions + row payload), allgathered back; the
      requester overlays the segments addressed to it.

    Exposes the same get_rows/get_mail surface as a local owner, so
    ``[exchange]`` drops into gather_rows / gather_mail /
    pack_with_gathered_state unchanged.  All hosts must issue the same
    SEQUENCE of gather calls (they do: one pack_with_gathered_state per
    host per super-batch = 3 gathers in lockstep).  The i64 payload
    encoding spends 8 B per element for simplicity; a production
    deployment would bit-pack (the logical row payload is 16 B/entry,
    BASELINE.md cost model)."""

    def __init__(self, owner, host: int, n_hosts: int, allgather):
        self.owner = owner
        self.host = host
        self.n_hosts = n_hosts
        self.allgather = allgather
        self.K = owner.K
        self.S = owner.S
        self.lo = 0             # presents as covering every node the
        self.hi = owner.N       # shard group collectively owns

    def _resolve(self, nodes, fields_fn, width: int):
        """Shared 2-round protocol.  ``fields_fn(req_nodes)`` returns
        (payload_matrix (n, width) int64, owned_mask) from the LOCAL
        shard; returns the assembled (n, width) matrix + mask."""
        nodes = np.asarray(nodes, np.int64)
        reqs = self.allgather(nodes)
        parts = []
        for h, req in enumerate(reqs):
            data, owned = fields_fn(np.asarray(req, np.int64))
            pos = np.nonzero(owned)[0].astype(np.int64)
            seg = np.concatenate(
                [np.asarray([h, len(pos)], np.int64), pos,
                 data[pos].reshape(-1)])
            parts.append(seg)
        resp = self.allgather(np.concatenate(parts)
                              if parts else np.zeros(0, np.int64))
        out = np.zeros((len(nodes), width), np.int64)
        mask = np.zeros(len(nodes), bool)
        for payload in resp:
            payload = np.asarray(payload, np.int64)
            i = 0
            while i < len(payload):
                dest, npos = int(payload[i]), int(payload[i + 1])
                i += 2
                pos = payload[i:i + npos]
                i += npos
                data = payload[i:i + npos * width].reshape(npos, width)
                i += npos * width
                if dest == self.host and npos:
                    out[pos] = data
                    mask[pos] = True
        return out, mask

    def get_rows(self, nodes):
        K = self.K

        def fields(req):
            nbr, eid, t, clock, owned = self.owner.get_rows(req)
            data = np.concatenate(
                [nbr.astype(np.int64),
                 eid,
                 t.view(np.uint32).astype(np.int64),
                 clock.view(np.uint32).astype(np.int64)[:, None]],
                axis=1)
            return data, owned

        out, mask = self._resolve(nodes, fields, 3 * K + 1)
        nbr = out[:, :K].astype(np.int32)
        eid = np.where(mask[:, None], out[:, K:2 * K], -1)
        t = out[:, 2 * K:3 * K].astype(np.uint32).view(np.float32) \
            .reshape(len(nodes), K)
        t = np.where(mask[:, None], t, -1.0).astype(np.float32)
        clock = out[:, 3 * K].astype(np.uint32).view(np.float32) \
            .reshape(len(nodes))
        clock = np.where(mask, clock, 0.0).astype(np.float32)
        return nbr, eid, t, clock, mask

    def get_mail(self, nodes):
        def fields(req):
            ptr, owned = self.owner.get_mail(req)
            return ptr[:, None], owned

        out, mask = self._resolve(nodes, fields, 1)
        return out[:, 0], mask
