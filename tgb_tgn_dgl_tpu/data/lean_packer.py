"""LeanPacker — host side of device-cache mode (ops/lean_wire.py).

Emits a LeanWire per batch: root sets, slot maps, intra-batch COO,
mailbox write plan and RESOLVED per-(node, block) clock updates — all
pure functions of the batch's events/negatives.  Unlike StreamPacker
(data/packer.py) it keeps NO neighbor cache and NO clock table: that
state lives on device (ops/lean_wire.StreamDeviceState), so the host does
no O(N)-state gathers and the wire carries no (R, K) cache grids.

The only host state is the mailbox ring-pointer vector (slot assignment
for memory.mailbox_size > 1) — a pure function of the event stream, like
everything else here.

Clock-update resolution (reference model_utils.py:68-83): within block i
the reference executes clock[neg]=t, clock[dst]=t, clock[src]=t as three
vectorized assignments over the block's events in order, so the resolved
value per (node, block) is the write with the largest (phase, event
position), phase order neg < dst < src.  Eval mode first wipes ALL clocks
to the block max-t (:78-79) and writes only dst/src — the per-block wipe
values travel in the wire (wipe_t) and earlier-block writes are dead.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from .packer import PackerConfig, _bucket_p, _bucket_pow2


class NativeLeanPacker:
    """C++-backed lean emitter (csrc/packer.cpp packer_pack_fill_lean) —
    bit-exact twin of LeanPacker (tests/test_lean.py), with the host hot
    loops (root sets, intra runs, clock-write resolution, mail plan)
    native.  The only mutable state is the mailbox ring-pointer vector,
    held inside the C++ handle."""

    def __init__(self, num_nodes: int, cfg: PackerConfig):
        from . import native_packer as npk

        assert cfg.strategy == "recent" and cfg.layers == 1
        lib = npk._lib()
        assert lib is not None and hasattr(lib, "packer_pack_fill_lean")
        self._lib = lib
        self.N = num_nodes
        self.cfg = cfg
        self._h = lib.packer_new(num_nodes, cfg.num_neighbors,
                                 cfg.mailbox_size)
        self._sticky: dict = {}

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.packer_free(h)
            self._h = None

    def _sticky_bucket(self, key, name: str, value: int) -> int:
        cur = self._sticky.setdefault(key, {})
        cur[name] = max(cur.get(name, 0), value)
        return cur[name]

    def reset_cache(self) -> None:
        # resets ring pointers (the C++ cache/clock state is unused in
        # device-cache mode — the device owns it)
        self._lib.packer_reset(self._h)

    def _get_full_state(self):
        import ctypes
        K = self.cfg.num_neighbors
        nbr = np.empty((self.N, K), np.int32)
        eid = np.empty((self.N, K), np.int64)
        t = np.empty((self.N, K), np.float32)
        clock = np.empty(self.N, np.float32)
        ptr = np.empty(self.N, np.int64)
        cur = ctypes.c_int64()
        self._lib.packer_get_state(self._h, nbr, eid, t, clock, ptr,
                                   ctypes.byref(cur))
        return nbr, eid, t, clock, cur.value, ptr

    @property
    def mail_ptr(self):
        return self._get_full_state()[5]

    @mail_ptr.setter
    def mail_ptr(self, value):
        nbr, eid, t, clock, cur, _ = self._get_full_state()
        self._lib.packer_set_state(
            self._h, nbr, eid, t, clock,
            np.ascontiguousarray(value, np.int64), int(cur))

    def snapshot(self):
        return (self.mail_ptr.copy(),)

    def restore(self, snap) -> None:
        self.mail_ptr = snap[0]

    def pack_wire(self, src, dst, t, ev_idx, blocks, neg,
                  eval_mode: bool = False, insert: bool = True,
                  write_mail: bool = True):
        from ..ops.lean_wire import LeanWire

        cfg = self.cfg
        lib = self._lib
        Braw = len(src)
        B = cfg.batch_size
        src = np.ascontiguousarray(src, np.int32)
        dst = np.ascontiguousarray(dst, np.int32)
        t = np.ascontiguousarray(t, np.float32)
        ev_idx64 = np.ascontiguousarray(ev_idx, np.int64)
        blocks32 = np.ascontiguousarray(blocks, np.int32)
        neg = np.asarray(neg, np.int32)
        neg2d = np.ascontiguousarray(neg.reshape(Braw, -1))
        M = neg2d.shape[1]
        cap_p = -1 if cfg.max_intra_block is None else cfg.max_intra_block
        k = int(blocks32.max()) + 1 if Braw else 0
        skey = (M, bool(eval_mode))

        sizes = np.zeros(7, np.int64)
        lib.packer_pack_begin(self._h, src, dst, t, ev_idx64, blocks32,
                              neg2d, Braw, M, int(eval_mode), cap_p,
                              sizes)
        total_roots, p_exact, _U, nnz = (int(sizes[0]), int(sizes[1]),
                                         int(sizes[2]), int(sizes[3]))
        P = (cfg.max_intra_block if cfg.max_intra_block is not None
             else self._sticky_bucket(skey, "P", _bucket_p(p_exact)))
        R = self._sticky_bucket(
            skey, "R", _bucket_pow2(max(total_roots, 1),
                                    cfg.root_bucket_lo))
        Ei = self._sticky_bucket(skey, "Ei",
                                 _bucket_pow2(max(nnz, 1), lo=2 * B))
        q_bound = (2 + (0 if eval_mode else M)) * B
        Q = _bucket_pow2(max(q_bound, 1), lo=B)
        Kb = self._sticky_bucket(skey, "Kb", _bucket_pow2(max(k, 1),
                                                          lo=16))

        ev_src = np.empty(B, np.int32)
        ev_dst = np.empty(B, np.int32)
        ev_t = np.empty(B, np.float32)
        ev_idx_out = np.empty(B, np.int32)
        ev_valid = np.empty(B, np.uint8)
        ev_neg = np.empty((B, M), np.int32)
        ev_src_slot = np.empty(B, np.int32)
        ev_pos_slot = np.empty(B, np.int32)
        ev_neg_slot = np.empty((B, M), np.int32)
        root_nid = np.empty(R, np.int32)
        root_blk = np.empty(R, np.int32)
        ia_row = np.empty(Ei, np.int32)
        ia_pos = np.empty(Ei, np.int32)
        ia_side = np.empty(Ei, np.int32)
        W = 2 * B
        mw_node = np.empty(W, np.int32)
        mw_slot = np.empty(W, np.int32)
        mw_partner = np.empty(W, np.int32)
        mw_t = np.empty(W, np.float32)
        mw_eid = np.empty(W, np.int32)
        upd_node = np.empty(Q, np.int32)
        upd_blk = np.empty(Q, np.int32)
        upd_t = np.empty(Q, np.float32)
        upd_last = np.empty(Q, np.uint8)
        wipe_t = np.empty(Kb, np.float32)
        wipe_final = np.zeros(1, np.float32)

        lib.packer_pack_fill_lean(
            self._h, B, R, int(insert), int(write_mail),
            ev_src, ev_dst, ev_t, ev_idx_out, ev_valid, ev_neg,
            ev_src_slot, ev_pos_slot, ev_neg_slot,
            root_nid, root_blk,
            Ei, ia_row, ia_pos, ia_side,
            mw_node, mw_slot, mw_partner, mw_t, mw_eid,
            Q, upd_node, upd_blk, upd_t, upd_last,
            Kb, wipe_t, wipe_final)

        wire = LeanWire(
            ev_src=ev_src, ev_dst=ev_dst, ev_t=ev_t, ev_idx=ev_idx_out,
            ev_valid=ev_valid.astype(bool),
            ev_neg=ev_neg if M > 1 else ev_neg[:, 0],
            ev_src_slot=ev_src_slot, ev_pos_slot=ev_pos_slot,
            ev_neg_slot=ev_neg_slot if M > 1 else ev_neg_slot[:, 0],
            root_nid=root_nid, root_blk=root_blk,
            ia_row=ia_row, ia_pos=ia_pos, ia_side=ia_side,
            mw_node=mw_node, mw_slot=mw_slot, mw_partner=mw_partner,
            mw_t=mw_t, mw_eid=mw_eid,
            upd_node=upd_node, upd_blk=upd_blk, upd_t=upd_t,
            upd_last=upd_last.astype(bool),
            wipe_t=wipe_t, wipe_final=np.float32(wipe_final[0]),
        )
        return wire, P


def make_lean_packer(num_nodes: int, cfg: PackerConfig,
                     prefer_native: bool = True):
    """Factory: native lean emitter when built, numpy oracle otherwise."""
    from .build_hostops import build_if_needed
    from . import native_packer as npk

    if prefer_native and build_if_needed() and npk.available():
        lib = npk._lib()
        if hasattr(lib, "packer_pack_fill_lean"):
            return NativeLeanPacker(num_nodes, cfg)
    return LeanPacker(num_nodes, cfg)


class LeanPacker:
    """Host emitter for device-cache mode.  API mirrors StreamPacker's
    pack_wire (same arguments, returns (LeanWire, intra_width))."""

    def __init__(self, num_nodes: int, cfg: PackerConfig):
        assert cfg.strategy == "recent", \
            "device-cache mode implements the streaming 'recent' strategy"
        assert cfg.layers == 1, \
            "device-cache mode supports gnn.layer == 1 (use the host " \
            "packer for stacked layers)"
        self.N = num_nodes
        self.cfg = cfg
        self.mail_ptr = np.zeros(num_nodes, dtype=np.int64)
        self._sticky: dict = {}

    def _sticky_bucket(self, key, name: str, value: int) -> int:
        cur = self._sticky.setdefault(key, {})
        cur[name] = max(cur.get(name, 0), value)
        return cur[name]

    def reset_cache(self) -> None:
        """Train-epoch-start reset: the engine resets the DEVICE cache
        (reset_stream_cache); the host mirror only resets ring pointers
        (reference pyg_epoch_utils.py:11-16 resets memory with the cache)."""
        self.mail_ptr.fill(0)

    def snapshot(self):
        return (self.mail_ptr.copy(),)

    def restore(self, snap) -> None:
        self.mail_ptr = snap[0].copy()

    def pack_wire(self, src, dst, t, ev_idx, blocks, neg,
                  eval_mode: bool = False, insert: bool = True,
                  write_mail: bool = True):
        from ..ops.lean_wire import LeanWire

        cfg = self.cfg
        K = cfg.num_neighbors
        Braw = len(src)
        B = cfg.batch_size
        N = self.N
        src = np.asarray(src, np.int32)
        dst = np.asarray(dst, np.int32)
        t = np.asarray(t, np.float32)
        blocks = np.asarray(blocks, np.int64)
        neg = np.asarray(neg, np.int32)
        neg2d = neg.reshape(Braw, -1)
        M = neg2d.shape[1]
        k = int(blocks.max()) + 1 if Braw else 0
        skey = (M, bool(eval_mode))

        # --- per-node intra-batch runs (identical to StreamPacker) ------
        nodes2 = np.concatenate([src, dst]).astype(np.int64)
        part_is_src2 = np.concatenate([np.zeros(Braw, np.int8),
                                       np.ones(Braw, np.int8)])
        pos2 = np.concatenate([np.arange(Braw), np.arange(Braw)]
                              ).astype(np.int64)
        order2 = np.lexsort((pos2, nodes2))
        s_nodes2 = nodes2[order2]
        s_pos2 = pos2[order2]
        s_side2 = part_is_src2[order2]   # 1 → partner is src[pos]
        s_blk2 = blocks[s_pos2]
        run_nodes, run_starts = np.unique(s_nodes2, return_index=True)
        run_ends = np.append(run_starts[1:], len(s_nodes2))
        run_of = {int(u): (int(a), int(b))
                  for u, a, b in zip(run_nodes, run_starts, run_ends)}

        # --- pass 1: root sets + slot maps (StreamPacker pass 1) --------
        root_nid_parts: List[np.ndarray] = []
        block_sel: List[np.ndarray] = []
        offsets = [0]
        ev_src_slot = np.zeros(Braw, np.int64)
        ev_pos_slot = np.zeros(Braw, np.int64)
        ev_neg_slot = np.zeros((Braw, M), np.int64)
        for i in range(k):
            sel = np.nonzero(blocks == i)[0]
            block_sel.append(sel)
            roots_i = np.unique(np.concatenate(
                [src[sel], dst[sel], neg2d[sel].ravel()]))
            off = offsets[-1]
            ev_src_slot[sel] = np.searchsorted(roots_i, src[sel]) + off
            ev_pos_slot[sel] = np.searchsorted(roots_i, dst[sel]) + off
            ev_neg_slot[sel] = np.searchsorted(roots_i, neg2d[sel]) + off
            root_nid_parts.append(roots_i.astype(np.int32))
            offsets.append(off + len(roots_i))
        total_roots = offsets[-1]

        # --- intra counts + COO (row, pos, side), sorted by (row, col) --
        intra_rows: List[np.ndarray] = []
        intra_pos: List[np.ndarray] = []
        intra_side: List[np.ndarray] = []
        p_exact = 0
        for i in range(k):
            off = offsets[i]
            for j, r in enumerate(root_nid_parts[i]):
                run = run_of.get(int(r))
                if run is None:
                    continue
                a, b2 = run
                cnt = int(np.searchsorted(s_blk2[a:b2], i, side="left"))
                if cnt == 0:
                    continue
                p_exact = max(p_exact, cnt)
                take = cnt if cfg.max_intra_block is None \
                    else min(cnt, cfg.max_intra_block)
                lo = a + cnt - take
                intra_rows.append(np.full(take, off + j, np.int32))
                intra_pos.append(s_pos2[lo:a + cnt].astype(np.int32))
                intra_side.append(s_side2[lo:a + cnt].astype(np.int32))
        if cfg.max_intra_block is not None:
            p_exact = min(p_exact, cfg.max_intra_block)
            P = cfg.max_intra_block
        else:
            P = self._sticky_bucket(skey, "P", _bucket_p(p_exact))
        R = self._sticky_bucket(
            skey, "R", _bucket_pow2(max(total_roots, 1),
                                    cfg.root_bucket_lo))
        nnz = sum(len(a) for a in intra_rows)
        Ei = self._sticky_bucket(skey, "Ei",
                                 _bucket_pow2(max(nnz, 1), lo=2 * B))
        ia_row = np.full(Ei, R, np.int32)
        ia_pos = np.zeros(Ei, np.int32)
        ia_side = np.zeros(Ei, np.int32)
        if nnz:
            ia_row[:nnz] = np.concatenate(intra_rows)
            ia_pos[:nnz] = np.concatenate(intra_pos)
            ia_side[:nnz] = np.concatenate(intra_side)

        root_nid = np.full(R, N, np.int32)
        root_blk = np.zeros(R, np.int32)
        for i in range(k):
            root_nid[offsets[i]:offsets[i + 1]] = root_nid_parts[i]
            root_blk[offsets[i]:offsets[i + 1]] = i

        # --- resolved clock updates -------------------------------------
        # write streams per block: train = neg(phase 0), dst(1), src(2);
        # eval = dst(1), src(2) (the wipe replaces the neg writes).
        w_node: List[np.ndarray] = []
        w_blk: List[np.ndarray] = []
        w_t: List[np.ndarray] = []
        w_phase: List[np.ndarray] = []
        w_pos: List[np.ndarray] = []
        wipe_vals = np.zeros(max(k, 1), np.float32)
        for i in range(k):
            sel = block_sel[i]
            ti = t[sel]
            if eval_mode:
                wipe_vals[i] = ti.max() if len(ti) else 0.0
            else:
                w_node.append(neg2d[sel].ravel().astype(np.int64))
                w_blk.append(np.full(len(sel) * M, i, np.int64))
                w_t.append(np.repeat(ti, M))
                w_phase.append(np.zeros(len(sel) * M, np.int64))
                w_pos.append(np.repeat(sel, M))
            for phase, arr in ((1, dst), (2, src)):
                w_node.append(arr[sel].astype(np.int64))
                w_blk.append(np.full(len(sel), i, np.int64))
                w_t.append(ti)
                w_phase.append(np.full(len(sel), phase, np.int64))
                w_pos.append(sel)
        if w_node:
            wn = np.concatenate(w_node)
            wb = np.concatenate(w_blk)
            wt = np.concatenate(w_t).astype(np.float32)
            wp = np.concatenate(w_phase)
            wo = np.concatenate(w_pos)
            # last write per (node, block) = max (phase, pos)
            order = np.lexsort((wo, wp, wb, wn))
            wn, wb, wt = wn[order], wb[order], wt[order]
            keep = np.append((wn[1:] != wn[:-1]) | (wb[1:] != wb[:-1]),
                             True)
            wn, wb, wt = wn[keep], wb[keep], wt[keep]
        else:
            wn = np.zeros(0, np.int64)
            wb = np.zeros(0, np.int64)
            wt = np.zeros(0, np.float32)
        Qn = len(wn)
        # bound-based bucket (constant per (M, eval) profile): ≤ one
        # resolved write per (participant, block) ≤ write-stream length
        q_bound = (2 + (0 if eval_mode else M)) * B
        Q = _bucket_pow2(max(q_bound, 1), lo=B)
        assert Qn <= Q
        upd_node = np.full(Q, N, np.int32)
        upd_blk = np.zeros(Q, np.int32)
        upd_t = np.zeros(Q, np.float32)
        upd_last = np.zeros(Q, bool)
        upd_node[:Qn] = wn
        upd_blk[:Qn] = wb
        upd_t[:Qn] = wt
        if Qn:
            node_last = np.append(wn[1:] != wn[:-1], True)
            if eval_mode:
                # post-batch clock = last-block wipe overridden only by
                # writes IN the last block
                node_last &= wb == (k - 1)
            upd_last[:Qn] = node_last
        Kb = self._sticky_bucket(skey, "Kb", _bucket_pow2(max(k, 1),
                                                          lo=16))
        wipe_t = np.zeros(Kb, np.float32)
        wipe_t[:max(k, 1)] = wipe_vals
        wipe_final = np.float32(wipe_vals[k - 1] if (eval_mode and k)
                                else 0.0)

        # --- mailbox write plan (StreamPacker semantics) -----------------
        S = cfg.mailbox_size
        W = 2 * B
        mw_node = np.full(W, N, np.int32)
        mw_slot = np.zeros(W, np.int32)
        mw_partner = np.zeros(W, np.int32)
        mw_t = np.zeros(W, np.float32)
        mw_eid = np.zeros(W, np.int32)
        if Braw and write_mail:
            wnode = np.empty(2 * Braw, np.int64)
            wpart = np.empty(2 * Braw, np.int64)
            wnode[0::2], wnode[1::2] = src, dst
            wpart[0::2], wpart[1::2] = dst, src
            wtm = np.repeat(t, 2)
            weid = np.repeat(np.asarray(ev_idx, np.int64), 2)
            posw = np.arange(2 * Braw)
            order = np.lexsort((posw, wnode))
            sn = wnode[order]
            runs, starts = np.unique(sn, return_index=True)
            ends = np.append(starts[1:], len(sn))
            for u, a, b2 in zip(runs, starts, ends):
                c = b2 - a
                kept = min(c, S)
                take = order[b2 - kept:b2]
                ptr = self.mail_ptr[u]
                slots = (ptr + np.arange(kept)) % S
                if insert:
                    self.mail_ptr[u] = (ptr + kept) % S
                mw_node[take] = u
                mw_slot[take] = slots
                mw_partner[take] = wpart[take]
                mw_t[take] = wtm[take]
                mw_eid[take] = weid[take]

        # --- pad events ---------------------------------------------------
        def pad1(a, fill=0, dtype=None):
            out = np.full(B, fill, dtype=dtype or a.dtype)
            out[:Braw] = a
            return out

        ev_valid = np.zeros(B, bool)
        ev_valid[:Braw] = True
        ev_neg_out = np.zeros((B, M), np.int32)
        ev_neg_out[:Braw] = neg2d
        ev_neg_slot_out = np.zeros((B, M), np.int32)
        ev_neg_slot_out[:Braw] = ev_neg_slot
        wire = LeanWire(
            ev_src=pad1(src), ev_dst=pad1(dst), ev_t=pad1(t),
            ev_idx=pad1(np.asarray(ev_idx, np.int32)),
            ev_valid=ev_valid,
            ev_neg=ev_neg_out if M > 1 else ev_neg_out[:, 0],
            ev_src_slot=pad1(ev_src_slot.astype(np.int32)),
            ev_pos_slot=pad1(ev_pos_slot.astype(np.int32)),
            ev_neg_slot=(ev_neg_slot_out if M > 1
                         else ev_neg_slot_out[:, 0]),
            root_nid=root_nid, root_blk=root_blk,
            ia_row=ia_row, ia_pos=ia_pos, ia_side=ia_side,
            mw_node=mw_node, mw_slot=mw_slot, mw_partner=mw_partner,
            mw_t=mw_t, mw_eid=mw_eid,
            upd_node=upd_node, upd_blk=upd_blk, upd_t=upd_t,
            upd_last=upd_last,
            wipe_t=wipe_t, wipe_final=wipe_final,
        )
        return wire, P
