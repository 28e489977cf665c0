"""NativeStreamPacker — ctypes wrapper over csrc/packer.cpp.

Drop-in replacement for data/packer.py::StreamPacker (same constructor,
same ``pack``/``insert``/``reset_cache``/``snapshot``/``restore`` API,
bit-identical Pack outputs — tests/test_native_packer.py), with the host
hot loops in C++.  The numpy packer remains the oracle and the fallback
when the native library is unavailable.
"""
from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from . import hostops
from .packer import (Pack, PackerConfig, _bucket_p, _bucket_pow2)

_DECLARED = False


def _lib():
    lib = hostops._load()
    if lib is None:
        return None
    global _DECLARED
    if not _DECLARED:
        i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        c = ctypes
        lib.packer_new.argtypes = [c.c_int64, c.c_int32, c.c_int32]
        lib.packer_new.restype = c.c_void_p
        lib.packer_free.argtypes = [c.c_void_p]
        lib.packer_reset.argtypes = [c.c_void_p]
        lib.packer_get_state.argtypes = [c.c_void_p, i32p, i64p, f32p, f32p,
                                         i64p, c.POINTER(c.c_int64)]
        lib.packer_set_state.argtypes = [c.c_void_p, i32p, i64p, f32p, f32p,
                                         i64p, c.c_int64]
        if hasattr(lib, "packer_get_clock"):   # absent in stale builds
            lib.packer_get_clock.argtypes = [c.c_void_p, f32p]
        lib.packer_insert.argtypes = [c.c_void_p, i32p, i32p, f32p, i64p,
                                      c.c_int64]
        lib.packer_pack_begin.argtypes = [
            c.c_void_p, i32p, i32p, f32p, i64p, i32p, i32p,
            c.c_int64, c.c_int64, c.c_int32, c.c_int64, i64p]
        lib.packer_pack_fill.argtypes = [
            c.c_void_p, c.c_int64, c.c_int64, c.c_int64, c.c_int32,
            c.c_int32,                                   # write_mail
            i32p, i32p, f32p, i32p, u8p, i32p,          # events
            i32p, u8p,                                   # roots
            i32p, f32p, i8p, i32p,                       # grid
            i32p, i32p, i32p,                            # slot maps
            c.c_int64, i32p, i32p, i32p,                 # uniq/locs
            i32p, i32p, i32p, f32p, i32p]                # write plan
        lib.packer_pack_fill_wire.argtypes = [
            c.c_void_p, c.c_int64, c.c_int64, c.c_int32,
            c.c_int32,                                   # write_mail
            i32p, i32p, f32p, i32p, u8p, i32p,          # events
            i32p, i32p, i32p,                            # slot maps
            c.c_int64, i32p, i32p,                       # uniq, root_loc
            i32p, i32p, f32p, f32p,                      # cache + self_dt
            c.c_int64, i32p, i32p, i32p, i32p, f32p,     # intra COO
            i32p, i32p, i32p, f32p, i32p]                # write plan
        if hasattr(lib, "packer_pack_fill_wire2"):
            lib.packer_pack_fill_wire2.argtypes = (
                lib.packer_pack_fill_wire.argtypes + [i32p, i32p])
        if hasattr(lib, "packer_pack_fill_wire3"):
            lib.packer_pack_fill_wire3.argtypes = [
                c.c_void_p, c.c_int64, c.c_int64, c.c_int32,
                c.c_int32,                                   # write_mail
                i32p, i32p, f32p, i32p, u8p, i32p,          # events
                i32p, i32p, i32p,                            # slot maps
                c.c_int64, i32p,                             # uniq
                i32p, i32p,                                  # roots loc/cr
                c.c_int64, i32p, i32p,                       # cr tables
                f32p, f32p, c.c_int64, f32p,                 # dt outputs
                i32p, i32p, i32p, i32p,                      # intra ranges
                i32p]                                        # mw_slot
        if hasattr(lib, "packer_dedup_submit"):
            vp = c.c_void_p
            lib.packer_dedup_submit.argtypes = [
                vp, i32p, i32p, f32p, i64p, i32p, i32p,
                c.c_int64, c.c_int64, c.c_int32, c.c_int64,
                c.c_int32, c.c_int32, c.c_int64, c.c_int64, i64p]
            lib.packer_dedup_submit.restype = c.c_int32
            lib.packer_dedup_wait.argtypes = [vp, i64p]
            lib.packer_dedup_read.argtypes = [
                vp, c.c_int64,
                vp, vp, f32p, i32p, u8p, vp,      # events
                vp, vp, vp,                        # slot maps
                vp, vp, vp, vp, i32p,              # uniq/locs/cr
                f32p, f32p, f32p,                  # dt outputs
                i32p, vp, u8p, vp, vp]             # intra + mw
        if hasattr(lib, "packer_set_rows"):
            lib.packer_set_rows.argtypes = [
                c.c_void_p, i64p, c.c_int64, i32p, i64p, f32p, f32p]
            lib.packer_set_clock_rows.argtypes = [
                c.c_void_p, i64p, c.c_int64, f32p]
            lib.packer_set_mail_rows.argtypes = [
                c.c_void_p, i64p, c.c_int64, i64p]
            lib.packer_clear_rows.argtypes = [
                c.c_void_p, i64p, c.c_int64, c.c_int32]
        if hasattr(lib, "packer_pack_fill_lean"):
            lib.packer_pack_fill_lean.argtypes = [
                c.c_void_p, c.c_int64, c.c_int64, c.c_int32,
                c.c_int32,                               # write_mail
                i32p, i32p, f32p, i32p, u8p, i32p,      # events
                i32p, i32p, i32p,                        # slot maps
                i32p, i32p,                              # roots nid/blk
                c.c_int64, i32p, i32p, i32p,             # intra COO
                i32p, i32p, i32p, f32p, i32p,            # write plan
                c.c_int64, i32p, i32p, f32p, u8p,        # upd list
                c.c_int64, f32p, f32p]                   # wipe
        _DECLARED = True
    return lib


def available() -> bool:
    return _lib() is not None and hasattr(_lib(), "packer_new")


class NativeStreamPacker:
    """API-compatible with StreamPacker; state lives in C++."""

    def __init__(self, num_nodes: int, cfg: PackerConfig):
        lib = _lib()
        assert lib is not None, "libhostops.so not built"
        self._lib = lib
        self.N = num_nodes
        self.cfg = cfg
        self._h = lib.packer_new(num_nodes, cfg.num_neighbors,
                                 cfg.mailbox_size)
        self._rng = np.random.default_rng(cfg.seed)
        # sticky shape buckets per (M, eval_mode) — see StreamPacker
        self._sticky: dict = {}

    def _sticky_bucket(self, key, name: str, value: int) -> int:
        cur = self._sticky.setdefault(key, {})
        cur[name] = max(cur.get(name, 0), value)
        return cur[name]

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.packer_free(h)
            self._h = None

    # ------------------------------------------------------------- state
    def reset_cache(self) -> None:
        self._lib.packer_reset(self._h)

    def _get_state(self):
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

    def _set_state(self, nbr, eid, t, clock, cur, ptr):
        self._lib.packer_set_state(
            self._h, np.ascontiguousarray(nbr, np.int32),
            np.ascontiguousarray(eid, np.int64),
            np.ascontiguousarray(t, np.float32),
            np.ascontiguousarray(clock, np.float32),
            np.ascontiguousarray(ptr, np.int64), int(cur))

    # StreamPacker-compatible state views (checkpointing reads these)
    @property
    def cache_nbr(self):
        return self._get_state()[0]

    @property
    def cache_eid(self):
        return self._get_state()[1]

    @property
    def cache_t(self):
        return self._get_state()[2]

    def clock_snapshot(self) -> np.ndarray:
        """Fresh (N,) clock copy via the clock-only C entry — the
        train-lean wire snapshots this EVERY batch; going through
        _get_state would materialize the whole (N, K) cache state per
        batch just to read (N,) floats."""
        if hasattr(self._lib, "packer_get_clock"):
            clock = np.empty(self.N, np.float32)
            self._lib.packer_get_clock(self._h, clock)
            return clock
        return self._get_state()[3]

    @property
    def clock(self):
        return self.clock_snapshot()

    @property
    def cur_e_id(self):
        return self._get_state()[4]

    @property
    def mail_ptr(self):
        return self._get_state()[5]

    def load_state(self, cache_nbr, cache_eid, cache_t, clock, cur_e_id,
                   mail_ptr) -> None:
        self._set_state(cache_nbr, cache_eid, cache_t, clock, cur_e_id,
                        mail_ptr)

    # --- row-level state surgery (owned-state scratch packs;
    # parallel/owned_state.py::pack_with_gathered_state) ---
    def rows_api_available(self) -> bool:
        return hasattr(self._lib, "packer_set_rows")

    def set_rows(self, nodes, nbr, eid, t, clock) -> None:
        nodes = np.ascontiguousarray(nodes, np.int64)
        if len(nodes) == 0:
            return
        self._lib.packer_set_rows(
            self._h, nodes, len(nodes),
            np.ascontiguousarray(nbr, np.int32),
            np.ascontiguousarray(eid, np.int64),
            np.ascontiguousarray(t, np.float32),
            np.ascontiguousarray(clock, np.float32))

    def set_clock_rows(self, nodes, clock) -> None:
        nodes = np.ascontiguousarray(nodes, np.int64)
        if len(nodes) == 0:
            return
        self._lib.packer_set_clock_rows(
            self._h, nodes, len(nodes),
            np.ascontiguousarray(clock, np.float32))

    def set_mail_rows(self, nodes, ptr) -> None:
        nodes = np.ascontiguousarray(nodes, np.int64)
        if len(nodes) == 0:
            return
        self._lib.packer_set_mail_rows(
            self._h, nodes, len(nodes),
            np.ascontiguousarray(ptr, np.int64))

    def clear_rows(self, nodes, zero_all_clocks: bool = False) -> None:
        nodes = np.ascontiguousarray(nodes, np.int64)
        self._lib.packer_clear_rows(self._h, nodes, len(nodes),
                                    int(zero_all_clocks))

    def snapshot(self):
        s = self._get_state()
        return (s[0], s[1], s[2], s[3], s[4], s[5])

    def restore(self, snap) -> None:
        self._set_state(snap[0], snap[1], snap[2], snap[3], snap[4], snap[5])

    def insert(self, src, dst, t, e_id=None) -> None:
        b = len(src)
        if b == 0:
            return
        if e_id is None:
            e_id = self.cur_e_id + np.arange(b, dtype=np.int64)
        self._lib.packer_insert(
            self._h, np.ascontiguousarray(src, np.int32),
            np.ascontiguousarray(dst, np.int32),
            np.ascontiguousarray(t, np.float32),
            np.ascontiguousarray(e_id, np.int64), b)

    # -------------------------------------------------------------- pack
    def pack(self, src, dst, t, ev_idx, blocks, neg,
             eval_mode: bool = False, insert: bool = True,
             write_mail: bool = True) -> Pack:
        assert self.cfg.layers == 1, (
            "native full-grid pack() emits no nbr_rslot; the engine path "
            "(pack_wire) supports layers > 1")
        cfg = self.cfg
        lib = self._lib
        K = cfg.num_neighbors
        Braw = len(src)
        B = cfg.batch_size
        src = np.ascontiguousarray(src, np.int32)
        dst = np.ascontiguousarray(dst, np.int32)
        t = np.ascontiguousarray(t, np.float32)
        ev_idx64 = np.ascontiguousarray(ev_idx, np.int64)
        blocks = np.ascontiguousarray(blocks, np.int32)
        neg = np.asarray(neg, np.int32)
        neg2d = np.ascontiguousarray(neg.reshape(Braw, -1))
        M = neg2d.shape[1]
        cap_p = -1 if cfg.max_intra_block is None else cfg.max_intra_block

        sizes = np.zeros(7, np.int64)
        lib.packer_pack_begin(self._h, src, dst, t, ev_idx64, blocks,
                              neg2d, Braw, M, int(eval_mode), cap_p, sizes)
        total_roots, p_exact, U = int(sizes[0]), int(sizes[1]), int(sizes[2])
        skey = (M, bool(eval_mode))
        P = (cfg.max_intra_block if cfg.max_intra_block is not None
             else self._sticky_bucket(skey, "P", _bucket_p(p_exact)))
        Kp = K + 1 + P
        R = self._sticky_bucket(
            skey, "R", _bucket_pow2(max(total_roots, 1), cfg.root_bucket_lo))
        Ub = self._sticky_bucket(
            skey, "Ub", _bucket_pow2(U + 1, cfg.root_bucket_lo))

        ev_src = np.empty(B, np.int32)
        ev_dst = np.empty(B, np.int32)
        ev_t = np.empty(B, np.float32)
        ev_idx_out = np.empty(B, np.int32)
        ev_valid = np.empty(B, np.uint8)
        ev_neg = np.empty((B, M), np.int32)
        root_nid = np.empty(R, np.int32)
        root_valid = np.empty(R, np.uint8)
        nbr_nid = np.empty((R, Kp), np.int32)
        nbr_dt = np.empty((R, Kp), np.float32)
        nbr_kind = np.empty((R, Kp), np.int8)
        nbr_feat = np.empty((R, Kp), np.int32)
        ev_src_slot = np.empty(B, np.int32)
        ev_pos_slot = np.empty(B, np.int32)
        ev_neg_slot = np.empty((B, M), np.int32)
        uniq_nid = np.empty(Ub, np.int32)
        root_loc = np.empty(R, np.int32)
        nbr_loc = np.empty((R, Kp), np.int32)
        W = 2 * B
        mw_node = np.empty(W, np.int32)
        mw_slot = np.empty(W, np.int32)
        mw_partner = np.empty(W, np.int32)
        mw_t = np.empty(W, np.float32)
        mw_eid = np.empty(W, np.int32)

        lib.packer_pack_fill(
            self._h, B, R, P, int(insert), int(write_mail),
            ev_src, ev_dst, ev_t, ev_idx_out, ev_valid, ev_neg,
            root_nid, root_valid,
            nbr_nid, nbr_dt, nbr_kind, nbr_feat,
            ev_src_slot, ev_pos_slot, ev_neg_slot,
            Ub, uniq_nid, root_loc, nbr_loc,
            mw_node, mw_slot, mw_partner, mw_t, mw_eid)

        k = int(blocks.max()) + 1 if Braw else 0
        return Pack(
            ev_src=ev_src, ev_dst=ev_dst, ev_t=ev_t, ev_idx=ev_idx_out,
            ev_valid=ev_valid.astype(bool),
            ev_neg=ev_neg if M > 1 else ev_neg[:, 0],
            root_nid=root_nid, root_valid=root_valid.astype(bool),
            nbr_nid=nbr_nid, nbr_dt=nbr_dt, nbr_kind=nbr_kind,
            nbr_feat=nbr_feat,
            ev_src_slot=ev_src_slot, ev_pos_slot=ev_pos_slot,
            ev_neg_slot=ev_neg_slot if M > 1 else ev_neg_slot[:, 0],
            uniq_nid=uniq_nid, root_loc=root_loc, nbr_loc=nbr_loc,
            mw_node=mw_node, mw_slot=mw_slot, mw_partner=mw_partner,
            mw_t=mw_t, mw_eid=mw_eid,
            num_blocks=k,
            num_real_events=Braw,
            num_real_roots=total_roots,
        )

    def pack_wire(self, src, dst, t, ev_idx, blocks, neg,
                  eval_mode: bool = False, insert: bool = True,
                  write_mail: bool = True):
        """Pack one batch straight into the compact WirePack (no full
        grids on the host at all).  Returns (WirePack, intra_width)."""
        from ..ops.wire import WirePack

        cfg = self.cfg
        lib = self._lib
        K = cfg.num_neighbors
        Braw = len(src)
        B = cfg.batch_size
        src = np.ascontiguousarray(src, np.int32)
        dst = np.ascontiguousarray(dst, np.int32)
        t = np.ascontiguousarray(t, np.float32)
        ev_idx64 = np.ascontiguousarray(ev_idx, np.int64)
        blocks = np.ascontiguousarray(blocks, np.int32)
        neg = np.asarray(neg, np.int32)
        neg2d = np.ascontiguousarray(neg.reshape(Braw, -1))
        M = neg2d.shape[1]
        cap_p = -1 if cfg.max_intra_block is None else cfg.max_intra_block

        sizes = np.zeros(7, np.int64)
        lib.packer_pack_begin(self._h, src, dst, t, ev_idx64, blocks,
                              neg2d, Braw, M, int(eval_mode), cap_p, sizes)
        total_roots, p_exact, U, nnz = (int(sizes[0]), int(sizes[1]),
                                        int(sizes[2]), int(sizes[3]))
        skey = (M, bool(eval_mode))
        P = (cfg.max_intra_block if cfg.max_intra_block is not None
             else self._sticky_bucket(skey, "P", _bucket_p(p_exact)))
        R = self._sticky_bucket(
            skey, "R", _bucket_pow2(max(total_roots, 1), cfg.root_bucket_lo))
        Ub = self._sticky_bucket(
            skey, "Ub", _bucket_pow2(U + 1, cfg.root_bucket_lo))
        Ei = self._sticky_bucket(
            skey, "Ei", _bucket_pow2(max(nnz, 1), lo=2 * B))

        ev_src = np.empty(B, np.int32)
        ev_dst = np.empty(B, np.int32)
        ev_t = np.empty(B, np.float32)
        ev_idx_out = np.empty(B, np.int32)
        ev_valid = np.empty(B, np.uint8)
        ev_neg = np.empty((B, M), np.int32)
        ev_src_slot = np.empty(B, np.int32)
        ev_pos_slot = np.empty(B, np.int32)
        ev_neg_slot = np.empty((B, M), np.int32)
        uniq_nid = np.empty(Ub, np.int32)
        root_loc = np.empty(R, np.int32)
        cache_loc = np.empty((R, K), np.int32)
        cache_feat = np.empty((R, K), np.int32)
        cache_dt = np.empty((R, K), np.float32)
        self_dt = np.empty(R, np.float32)
        ia_row = np.empty(Ei, np.int32)
        ia_col = np.empty(Ei, np.int32)
        ia_loc = np.empty(Ei, np.int32)
        ia_feat = np.empty(Ei, np.int32)
        ia_dt = np.empty(Ei, np.float32)
        W = 2 * B
        mw_node = np.empty(W, np.int32)
        mw_slot = np.empty(W, np.int32)
        mw_partner = np.empty(W, np.int32)
        mw_t = np.empty(W, np.float32)
        mw_eid = np.empty(W, np.int32)

        cache_rslot = ia_rslot = None
        if cfg.layers > 1:
            cache_rslot = np.empty((R, K), np.int32)
            ia_rslot = np.empty(Ei, np.int32)
            lib.packer_pack_fill_wire2(
                self._h, B, R, int(insert), int(write_mail),
                ev_src, ev_dst, ev_t, ev_idx_out, ev_valid, ev_neg,
                ev_src_slot, ev_pos_slot, ev_neg_slot,
                Ub, uniq_nid, root_loc,
                cache_loc, cache_feat, cache_dt, self_dt,
                Ei, ia_row, ia_col, ia_loc, ia_feat, ia_dt,
                mw_node, mw_slot, mw_partner, mw_t, mw_eid,
                cache_rslot, ia_rslot)
        else:
            lib.packer_pack_fill_wire(
                self._h, B, R, int(insert), int(write_mail),
                ev_src, ev_dst, ev_t, ev_idx_out, ev_valid, ev_neg,
                ev_src_slot, ev_pos_slot, ev_neg_slot,
                Ub, uniq_nid, root_loc,
                cache_loc, cache_feat, cache_dt, self_dt,
                Ei, ia_row, ia_col, ia_loc, ia_feat, ia_dt,
                mw_node, mw_slot, mw_partner, mw_t, mw_eid)

        wire = WirePack(
            cache_rslot=cache_rslot, ia_rslot=ia_rslot,
            ev_src=ev_src, ev_dst=ev_dst, ev_t=ev_t, ev_idx=ev_idx_out,
            ev_valid=ev_valid.astype(bool),
            ev_neg=ev_neg if M > 1 else ev_neg[:, 0],
            ev_src_slot=ev_src_slot, ev_pos_slot=ev_pos_slot,
            ev_neg_slot=ev_neg_slot if M > 1 else ev_neg_slot[:, 0],
            uniq_nid=uniq_nid, root_loc=root_loc,
            cache_loc=cache_loc, cache_feat=cache_feat, cache_dt=cache_dt,
            self_dt=self_dt,
            ia_row=ia_row, ia_col=ia_col, ia_loc=ia_loc, ia_feat=ia_feat,
            ia_dt=ia_dt,
            mw_node=mw_node, mw_slot=mw_slot, mw_partner=mw_partner,
            mw_t=mw_t, mw_eid=mw_eid,
        )
        return wire, P

    def pack_wire_dedup(self, src, dst, t, ev_idx, blocks, neg,
                        eval_mode: bool = False, insert: bool = True,
                        write_mail: bool = True):
        """Pack one batch straight into the DedupWire (ops/wire.py):
        C++ fills int32/float32 staging buffers, python narrows dtypes
        with the exact rules of the numpy oracle
        (StreamPacker.pack_wire_dedup; parity in
        tests/test_native_packer.py).  Returns (DedupWire, intra_width,
        num_blocks_bucket) or None (caller falls back to pack_wire)."""
        from ..ops.wire import DedupWire

        cfg = self.cfg
        lib = self._lib
        if not hasattr(lib, "packer_pack_fill_wire3"):
            return None
        K = cfg.num_neighbors
        Braw = len(src)
        B = cfg.batch_size
        if Braw == 0 or Braw > B:
            return None
        src = np.ascontiguousarray(src, np.int32)
        dst = np.ascontiguousarray(dst, np.int32)
        t = np.ascontiguousarray(t, np.float32)
        ev_idx64 = np.ascontiguousarray(ev_idx, np.int64)
        blocks = np.ascontiguousarray(blocks, np.int32)
        neg = np.asarray(neg, np.int32)
        neg2d = np.ascontiguousarray(neg.reshape(Braw, -1))
        M = neg2d.shape[1]
        cap_p = -1 if cfg.max_intra_block is None else cfg.max_intra_block

        sizes = np.zeros(7, np.int64)
        lib.packer_pack_begin(self._h, src, dst, t, ev_idx64, blocks,
                              neg2d, Braw, M, int(eval_mode), cap_p, sizes)
        total_roots, p_exact, U, n_ur = (int(sizes[0]), int(sizes[1]),
                                         int(sizes[2]), int(sizes[4]))
        nnz4 = int(sizes[6])   # 4-aligned prefix-list size (row gathers)
        skey = (M, bool(eval_mode))
        P = (cfg.max_intra_block if cfg.max_intra_block is not None
             else self._sticky_bucket(skey, "P", _bucket_p(p_exact)))
        if P > 255:
            return None                       # intra_cnt ships as u8
        R = self._sticky_bucket(
            skey, "R", _bucket_pow2(max(total_roots, 1), cfg.root_bucket_lo))
        Ub = self._sticky_bucket(
            skey, "Ub", _bucket_pow2(U + 1, cfg.root_bucket_lo))
        Ur = self._sticky_bucket(
            skey, "Ur", _bucket_pow2(n_ur + 1, cfg.root_bucket_lo))
        Ei = self._sticky_bucket(
            skey, "Ei", _bucket_pow2(max(nnz4, 4), lo=2 * B))

        ev_src = np.empty(B, np.int32)
        ev_dst = np.empty(B, np.int32)
        ev_t = np.empty(B, np.float32)
        ev_idx_out = np.empty(B, np.int32)
        ev_valid = np.empty(B, np.uint8)
        ev_neg = np.empty((B, M), np.int32)
        ev_src_slot = np.empty(B, np.int32)
        ev_pos_slot = np.empty(B, np.int32)
        ev_neg_slot = np.empty((B, M), np.int32)
        uniq_nid = np.empty(Ub, np.int32)
        root_loc = np.empty(R, np.int32)
        root_cr = np.empty(R, np.int32)
        cr_loc = np.empty((Ur, K), np.int32)
        cr_feat = np.empty((Ur, K), np.int32)
        cache_dt = np.empty((R, K), np.float32)
        self_dt = np.empty(R, np.float32)
        ia_dt = np.empty(Ei, np.float32)
        ne_ent = np.empty((2 * B, 2), np.int32)
        intra_lo = np.empty(R, np.int32)
        intra_cnt = np.empty(R, np.int32)
        intra_start = np.empty(R, np.int32)
        mw_slot = np.empty(2 * B, np.int32)

        lib.packer_pack_fill_wire3(
            self._h, B, R, int(insert), int(write_mail),
            ev_src, ev_dst, ev_t, ev_idx_out, ev_valid, ev_neg,
            ev_src_slot, ev_pos_slot, ev_neg_slot,
            Ub, uniq_nid,
            root_loc, root_cr,
            Ur, cr_loc, cr_feat,
            cache_dt, self_dt, Ei, ia_dt,
            ne_ent, intra_lo, intra_cnt, intra_start,
            mw_slot)

        N = self.N
        S = cfg.mailbox_size

        def enc(a, maxval):
            if maxval <= 0xFFFF:
                return a.astype(np.uint16)
            return a if a.dtype == np.int32 else a.astype(np.int32)

        if S <= 254:
            mw_out = np.where(mw_slot >= 0, mw_slot, 255).astype(np.uint8)
        else:
            mw_out = mw_slot

        wire = DedupWire(
            ev_src=enc(ev_src, N - 1),
            ev_dst=enc(ev_dst, N - 1),
            ev_t=ev_t,
            ev_idx=ev_idx_out,
            ev_valid=ev_valid.astype(bool),
            ev_neg=enc(ev_neg if M > 1 else ev_neg[:, 0], N - 1),
            ev_src_slot=enc(ev_src_slot, R - 1),
            ev_pos_slot=enc(ev_pos_slot, R - 1),
            ev_neg_slot=enc(ev_neg_slot if M > 1 else ev_neg_slot[:, 0],
                            R - 1),
            uniq_nid=enc(uniq_nid, N),
            root_loc=enc(root_loc, Ub - 1),
            root_cr=enc(root_cr, Ur - 1),
            cr_loc=enc(cr_loc, Ub - 1),
            cr_feat=cr_feat,
            cache_dt=cache_dt,
            self_dt=self_dt,
            ne_ent=ne_ent,
            intra_lo=enc(intra_lo, 2 * B - 1),
            intra_cnt=intra_cnt.astype(np.uint8),
            intra_start=enc(intra_start, Ei - 1),
            ia_dt=ia_dt,
            mw_slot=mw_out,
        )
        return wire, P

    # --------------------------------------------------- async pack-ahead
    # One-deep pipeline (VERDICT r3 item 2): submit ships the batch to a
    # C++ worker thread that runs begin + bucket ratchet + fill while
    # python dispatches the PREVIOUS batch; fetch blocks (usually
    # already done), narrows dtypes in C++, and returns the DedupWire.
    # Exactly one job may be outstanding; every synchronous packer entry
    # point waits for the worker first, so interleaved sync calls stay
    # correct (csrc/packer.cpp wait_idle).
    def async_available(self) -> bool:
        return hasattr(self._lib, "packer_dedup_submit")

    def pack_wire_dedup_submit(self, src, dst, t, ev_idx, blocks, neg,
                               eval_mode: bool = False, insert: bool = True,
                               write_mail: bool = True) -> bool:
        """Start packing on the C++ worker.  Returns False when the
        batch can't go through the dedup path at all (caller packs
        synchronously); P>255 fallback is detected at fetch time."""
        cfg = self.cfg
        Braw = len(src)
        B = cfg.batch_size
        if (Braw == 0 or Braw > B or cfg.layers != 1
                or not self.async_available()):
            return False
        src = np.ascontiguousarray(src, np.int32)
        dst = np.ascontiguousarray(dst, np.int32)
        t = np.ascontiguousarray(t, np.float32)
        ev_idx64 = np.ascontiguousarray(ev_idx, np.int64)
        blocks = np.ascontiguousarray(blocks, np.int32)
        neg2d = np.ascontiguousarray(np.asarray(neg, np.int32)
                                     .reshape(Braw, -1))
        M = neg2d.shape[1]
        skey = (M, bool(eval_mode))
        st = self._sticky.get(skey, {})
        sticky5 = np.asarray(
            [st.get("P", 0), st.get("R", 0), st.get("Ub", 0),
             st.get("Ur", 0), st.get("Ei", 0)], np.int64)
        cap_p = -1 if cfg.max_intra_block is None else cfg.max_intra_block
        self._lib.packer_dedup_submit(
            self._h, src, dst, t, ev_idx64, blocks, neg2d,
            Braw, M, int(eval_mode), cap_p, int(insert), int(write_mail),
            B, cfg.root_bucket_lo, sticky5)
        self._async_meta = skey
        return True

    def pack_wire_dedup_fetch(self):
        """(DedupWire, intra_width) for the submitted job, or None when
        the worker flagged the P>255 fallback (state untouched — the
        caller then packs the SAME batch synchronously via pack_wire)."""
        from ..ops.wire import DedupWire

        dims = np.zeros(6, np.int64)
        self._lib.packer_dedup_wait(self._h, dims)
        if dims[0]:
            return None
        P, R, Ub, Ur, Ei = (int(dims[1]), int(dims[2]), int(dims[3]),
                            int(dims[4]), int(dims[5]))
        skey = self._async_meta
        M = skey[0]
        cfg = self.cfg
        # keep the python sticky table in sync (warm_buckets seeding and
        # later sync packs read it)
        if cfg.max_intra_block is None:
            self._sticky_bucket(skey, "P", P)
        self._sticky_bucket(skey, "R", R)
        self._sticky_bucket(skey, "Ub", Ub)
        self._sticky_bucket(skey, "Ur", Ur)
        self._sticky_bucket(skey, "Ei", Ei)
        B = cfg.batch_size
        K = cfg.num_neighbors
        N = self.N
        S = cfg.mailbox_size

        def u16(maxval):
            return maxval <= 0xFFFF

        bits = ((1 if u16(N - 1) else 0)
                | (2 if u16(R - 1) else 0)
                | (4 if u16(N) else 0)
                | (8 if u16(Ub - 1) else 0)
                | (16 if u16(Ur - 1) else 0)
                | (32 if u16(Ub - 1) else 0)
                | (64 if u16(2 * B - 1) else 0)
                | (128 if u16(Ei - 1) else 0)
                | (256 if S <= 254 else 0))

        def alloc(shape, wide):
            return np.empty(shape, np.uint16 if wide else np.int32)

        ev_src = alloc(B, bits & 1)
        ev_dst = alloc(B, bits & 1)
        ev_t = np.empty(B, np.float32)
        ev_idx_out = np.empty(B, np.int32)
        ev_valid = np.empty(B, bool)
        ev_neg = alloc((B, M), bits & 1)
        ev_src_slot = alloc(B, bits & 2)
        ev_pos_slot = alloc(B, bits & 2)
        ev_neg_slot = alloc((B, M), bits & 2)
        uniq_nid = alloc(Ub, bits & 4)
        root_loc = alloc(R, bits & 8)
        root_cr = alloc(R, bits & 16)
        cr_loc = alloc((Ur, K), bits & 32)
        cr_feat = np.empty((Ur, K), np.int32)
        cache_dt = np.empty((R, K), np.float32)
        self_dt = np.empty(R, np.float32)
        ia_dt = np.empty(Ei, np.float32)
        ne_ent = np.empty((2 * B, 2), np.int32)
        intra_lo = alloc(R, bits & 64)
        intra_cnt = np.empty(R, np.uint8)
        intra_start = alloc(R, bits & 128)
        mw_slot = np.empty(2 * B, np.uint8 if bits & 256 else np.int32)

        d = lambda a: a.ctypes.data
        self._lib.packer_dedup_read(
            self._h, bits,
            d(ev_src), d(ev_dst), ev_t, ev_idx_out,
            ev_valid.view(np.uint8), d(ev_neg),
            d(ev_src_slot), d(ev_pos_slot), d(ev_neg_slot),
            d(uniq_nid), d(root_loc), d(root_cr), d(cr_loc), cr_feat,
            cache_dt, self_dt, ia_dt,
            ne_ent, d(intra_lo), intra_cnt, d(intra_start), d(mw_slot))

        wire = DedupWire(
            ev_src=ev_src, ev_dst=ev_dst, ev_t=ev_t, ev_idx=ev_idx_out,
            ev_valid=ev_valid,
            ev_neg=ev_neg if M > 1 else ev_neg[:, 0],
            ev_src_slot=ev_src_slot, ev_pos_slot=ev_pos_slot,
            ev_neg_slot=ev_neg_slot if M > 1 else ev_neg_slot[:, 0],
            uniq_nid=uniq_nid, root_loc=root_loc, root_cr=root_cr,
            cr_loc=cr_loc, cr_feat=cr_feat,
            cache_dt=cache_dt, self_dt=self_dt,
            ne_ent=ne_ent, intra_lo=intra_lo, intra_cnt=intra_cnt,
            intra_start=intra_start, ia_dt=ia_dt, mw_slot=mw_slot,
        )
        return wire, P

    @property
    def shapes_key(self):
        return (self.cfg.batch_size, self.cfg.num_neighbors)


def make_stream_packer(num_nodes: int, cfg: PackerConfig,
                       prefer_native: bool = True):
    """Factory: native when built, numpy otherwise."""
    from .build_hostops import build_if_needed
    from .packer import StreamPacker

    if (prefer_native and cfg.strategy == "recent" and build_if_needed()
            and available()):
        lib = _lib()
        # layers > 1 needs the rslot-emitting entry (rebuild the lib via
        # data/build_hostops if an old .so is loaded)
        if cfg.layers == 1 or hasattr(lib, "packer_pack_fill_wire2"):
            return NativeStreamPacker(num_nodes, cfg)
    return StreamPacker(num_nodes, cfg)
