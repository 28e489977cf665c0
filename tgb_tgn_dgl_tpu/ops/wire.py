"""Compact host→device wire format for packed batches.

The padded (R, Kp) in-edge grids of a Pack are ~6 MB/batch, and the
host→device link (PCIe, or a tunnel in remote setups) is the throughput
wall once the host packer is native (SURVEY.md §5.8: minimize host↔device
transfers).  A WirePack ships only the irreducible content (~1.3 MB):

  * the cache part as (R, K) loc/feat/dt (feat = −1 marks empty slots —
    kind is derivable, node id = uniq_nid[loc]);
  * the self-loop column as one (R,) dt vector (loc = root_loc);
  * the intra-batch part as a COO list (≤ 2B entries — each event
    contributes at most its two directions) instead of a mostly-empty
    (R, P) slab;
  * slot maps, uniq table and mailbox write plan unchanged.

``expand_wire`` reconstructs the full DevicePack ON DEVICE with cheap
concat/scatter ops inside the jitted step, so the model code is unchanged.
Scatter targets use the extra trash row R (pad entries carry row = R), and
every real (row, col) pair is unique by host construction.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.packer import (KIND_CACHE, KIND_INTRA, KIND_INVALID, KIND_SELF,
                           DevicePack, Pack, _bucket_pow2)


class WirePack(NamedTuple):
    ev_src: jnp.ndarray
    ev_dst: jnp.ndarray
    ev_t: jnp.ndarray
    ev_idx: jnp.ndarray
    ev_valid: jnp.ndarray
    ev_neg: jnp.ndarray
    ev_src_slot: jnp.ndarray
    ev_pos_slot: jnp.ndarray
    ev_neg_slot: jnp.ndarray
    uniq_nid: jnp.ndarray     # (U,)
    root_loc: jnp.ndarray     # (R,)
    cache_loc: jnp.ndarray    # (R, K)
    cache_feat: jnp.ndarray   # (R, K), -1 = empty slot
    cache_dt: jnp.ndarray     # (R, K)
    self_dt: jnp.ndarray      # (R,)
    ia_row: jnp.ndarray       # (Ei,) row in [0, R); R = padding
    ia_col: jnp.ndarray       # (Ei,) column in [0, P)
    ia_loc: jnp.ndarray       # (Ei,)
    ia_feat: jnp.ndarray      # (Ei,)
    ia_dt: jnp.ndarray        # (Ei,)
    mw_node: jnp.ndarray
    mw_slot: jnp.ndarray
    mw_partner: jnp.ndarray
    mw_t: jnp.ndarray
    mw_eid: jnp.ndarray
    # multi-layer (gnn.layer > 1): same-block root-slot per in-edge or -1
    # (data/packer.py nbr_rslot); the self column is derivable (own row).
    # None when layers == 1.
    cache_rslot: Optional[jnp.ndarray] = None   # (R, K)
    ia_rslot: Optional[jnp.ndarray] = None      # (Ei,)


def stack_wires(wires):
    """Stack same-shape wires (any wire NamedTuple) along a new leading
    axis for fused lax.scan dispatch; None fields stay None."""
    wp_cls = type(wires[0])
    return wp_cls(*((np.stack([getattr(w, f) for w in wires])
                     if getattr(wires[0], f) is not None else None)
                    for f in wp_cls._fields))


class BlobWire(NamedTuple):
    """A stacked wire group flattened into THREE dtype-class blobs.

    The tunneled H2D path charges a large FIXED cost per transferred
    ARRAY (measured: 21 per-field puts of one 5.4 MB group = 1.1 s in a
    degraded window vs 0.16 s for one blob of the same bytes), so the
    engine ships each fused group as 3 arrays instead of ~21.  Blobs are
    split by element width so the device side needs only same-width
    bitcasts (i32→f32 is free) and pure slices — no relayout copies:

      b32 — int32 view of every int32/float32 field
      b16 — uint16 fields
      b8  — uint8 / int8 / bool fields

    ``blob_stack`` builds (BlobWire, layout); ``unblob_one`` slices batch
    i's wire back out inside the jitted step.  The layout is a hashable
    static (field, class, dtype, shape, offset) tuple — same shape bucket
    ⇒ same layout ⇒ same compiled program."""

    b32: jnp.ndarray   # (G, n32) int32
    b16: jnp.ndarray   # (G, n16) uint16
    b8: jnp.ndarray    # (G, n8) uint8


_BLOB_KIND = {
    np.dtype(np.float32): "32", np.dtype(np.int32): "32",
    np.dtype(np.uint16): "16",
    np.dtype(np.uint8): "8", np.dtype(np.int8): "8",
    np.dtype(np.bool_): "8",
}
_WIRE_CLASSES = {}   # populated below, after all classes are defined


def blob_stack(wires):
    """Pack a list of same-shape wires into (BlobWire, layout)."""
    w0 = wires[0]
    G = len(wires)
    entries = []
    offs = {"32": 0, "16": 0, "8": 0}
    for f in w0._fields:
        a = getattr(w0, f)
        if a is None:
            entries.append((f, None, None, None, 0, 0))
            continue
        a = np.asarray(a)
        kind = _BLOB_KIND[a.dtype]
        entries.append((f, kind, a.dtype.str, a.shape, offs[kind], a.size))
        offs[kind] += a.size
    b32 = np.empty((G, offs["32"]), np.int32)
    b16 = np.empty((G, offs["16"]), np.uint16)
    b8 = np.empty((G, offs["8"]), np.uint8)
    rows = {"32": b32, "16": b16, "8": b8}
    for i, w in enumerate(wires):
        for f, kind, dstr, shape, off, n in entries:
            if kind is None:
                continue
            a = np.ascontiguousarray(getattr(w, f))
            rows[kind][i, off:off + n] = a.view(
                rows[kind].dtype).ravel()
    layout = (type(w0).__name__, tuple(entries))
    return BlobWire(b32=b32, b16=b16, b8=b8), layout


def unblob_one(b32_row, b16_row, b8_row, layout):
    """Reconstruct ONE batch's wire from blob rows (pure slices +
    same-width bitcasts; runs inside the jitted step)."""
    cls_name, entries = layout
    rows = {"32": b32_row, "16": b16_row, "8": b8_row}
    vals = []
    for f, kind, dstr, shape, off, n in entries:
        if kind is None:
            vals.append(None)
            continue
        seg = jax.lax.slice(rows[kind], (off,), (off + n,))
        dt = np.dtype(dstr)
        if dt == np.float32:
            seg = jax.lax.bitcast_convert_type(seg, jnp.float32)
        elif dt == np.int8:
            seg = jax.lax.bitcast_convert_type(seg, jnp.int8)
        elif dt == np.bool_:
            seg = seg != 0
        vals.append(seg.reshape(shape))
    return _WIRE_CLASSES[cls_name](*vals)


def pack_to_wire(pack: Pack, num_neighbors: int) -> WirePack:
    """Host-side compaction of a full Pack (numpy)."""
    K = num_neighbors
    R, Kp = pack.nbr_kind.shape
    P = Kp - K - 1
    B = pack.ev_src.shape[0]
    cache_kind = pack.nbr_kind[:, :K]
    cache_feat = np.where(cache_kind == KIND_CACHE,
                          pack.nbr_feat[:, :K], -1).astype(np.int32)
    # intra COO; an event feeds every later root slot of its endpoints, so
    # nnz can exceed 2B (≈14×B on tgbl-wiki with cap 32) — bucket pow2
    # from 2B up so the shape stays stable within a dataset
    rows, cols = np.nonzero(pack.nbr_kind[:, K + 1:] == KIND_INTRA)
    n = len(rows)
    Ei = _bucket_pow2(max(n, 1), lo=2 * B)
    ia_row = np.full(Ei, R, np.int32)
    ia_col = np.zeros(Ei, np.int32)
    ia_loc = np.zeros(Ei, np.int32)
    ia_feat = np.zeros(Ei, np.int32)
    ia_dt = np.zeros(Ei, np.float32)
    ia_row[:n] = rows
    ia_col[:n] = cols
    full_cols = cols + K + 1
    ia_loc[:n] = pack.nbr_loc[rows, full_cols]
    ia_feat[:n] = pack.nbr_feat[rows, full_cols]
    ia_dt[:n] = pack.nbr_dt[rows, full_cols]
    cache_rslot = ia_rslot = None
    if pack.nbr_rslot is not None:
        cache_rslot = np.where(cache_kind == KIND_CACHE,
                               pack.nbr_rslot[:, :K], -1).astype(np.int32)
        ia_rslot = np.full(Ei, -1, np.int32)
        ia_rslot[:n] = pack.nbr_rslot[rows, full_cols]
    return WirePack(
        cache_rslot=cache_rslot, ia_rslot=ia_rslot,
        ev_src=pack.ev_src, ev_dst=pack.ev_dst, ev_t=pack.ev_t,
        ev_idx=pack.ev_idx, ev_valid=pack.ev_valid, ev_neg=pack.ev_neg,
        ev_src_slot=pack.ev_src_slot, ev_pos_slot=pack.ev_pos_slot,
        ev_neg_slot=pack.ev_neg_slot,
        uniq_nid=pack.uniq_nid, root_loc=pack.root_loc,
        cache_loc=pack.nbr_loc[:, :K].astype(np.int32),
        cache_feat=cache_feat,
        cache_dt=pack.nbr_dt[:, :K],
        self_dt=pack.nbr_dt[:, K],
        ia_row=ia_row, ia_col=ia_col, ia_loc=ia_loc, ia_feat=ia_feat,
        ia_dt=ia_dt,
        mw_node=pack.mw_node, mw_slot=pack.mw_slot,
        mw_partner=pack.mw_partner, mw_t=pack.mw_t, mw_eid=pack.mw_eid,
    )


class CompactWire(NamedTuple):
    """Narrow-dtype wire (train.wire_compact).  Same information as a
    WirePack at ~60% of the bytes: index fields ship as uint16/uint8 when
    the static bucket ranges fit, ``ia_feat`` ships as a uint16 batch
    position (``ev_idx[ia_pos]`` is recovered on device), and the whole
    mailbox write plan collapses to one slot array — the packer's plan is
    identity-indexed (data/packer.py: ``mw_node[take] = wnode[take]``), so
    position ``i`` already encodes (event ``i>>1``, direction ``i&1``) and
    node/partner/t/eid are re-derived from the event arrays on device.
    H2D bandwidth is the throughput wall on tunneled hosts (SURVEY.md
    §5.8), so every byte here is ~linear in epoch time."""

    ev_src: jnp.ndarray        # (B,) u16|i32
    ev_dst: jnp.ndarray        # (B,) u16|i32
    ev_t: jnp.ndarray          # (B,) f32
    ev_idx: jnp.ndarray        # (B,) i32 (global msg-table rows)
    ev_valid: jnp.ndarray      # (B,) bool
    ev_neg: jnp.ndarray        # (B,)|(B,M) u16|i32
    ev_src_slot: jnp.ndarray   # (B,) u16|i32
    ev_pos_slot: jnp.ndarray   # (B,) u16|i32
    ev_neg_slot: jnp.ndarray   # (B,)|(B,M) u16|i32
    uniq_nid: jnp.ndarray      # (U,) u16|i32
    root_loc: jnp.ndarray      # (R,) u16|i32
    cache_loc: jnp.ndarray     # (R,K) u16|i32
    cache_feat: jnp.ndarray    # (R,K) i32 (global e_id; -1 = empty)
    cache_dt: jnp.ndarray      # (R,K) f32
    self_dt: jnp.ndarray       # (R,) f32
    ia_row: jnp.ndarray        # (Ei,) u16|i32 (R = padding)
    ia_col: jnp.ndarray        # (Ei,) u8|i32
    ia_loc: jnp.ndarray        # (Ei,) u16|i32
    ia_pos: jnp.ndarray        # (Ei,) u16|i32 batch position of the event
    ia_dt: jnp.ndarray         # (Ei,) f32
    mw_slot: jnp.ndarray       # (2B,) u8 (255 = no write) | i32 (-1)
    cache_rslot: Optional[jnp.ndarray] = None  # u16 (0xFFFF = -1) | i32
    ia_rslot: Optional[jnp.ndarray] = None


def compact_wire(wire: WirePack, num_nodes: int, intra_width: int,
                 mailbox_size: int) -> Optional[CompactWire]:
    """Host-side narrowing of a WirePack (numpy).  Returns None when the
    wire is not compactable (non-monotone ev_idx, or a mailbox plan that
    deviates from the packer's identity indexing) — callers then ship the
    full wire.  Dtype choices depend only on static bucket values
    (N, R, Ub, P, S), so jit buckets stay stable."""
    N = num_nodes
    B = int(wire.ev_src.shape[0])
    R = int(wire.root_loc.shape[0])
    Ub = int(wire.uniq_nid.shape[0])
    ev_idx = np.asarray(wire.ev_idx)
    ev_src = np.asarray(wire.ev_src)
    ev_dst = np.asarray(wire.ev_dst)

    # --- ia_feat -> batch position (needs strictly increasing ev_idx) ---
    nreal = int(np.asarray(wire.ev_valid).sum())
    evr = ev_idx[:nreal]
    if nreal and not np.all(np.diff(evr) > 0):
        return None
    ia_row = np.asarray(wire.ia_row)
    real = ia_row != R
    pos = np.zeros(ia_row.shape[0], np.int64)
    if real.any():
        if nreal == 0:
            return None
        p = np.searchsorted(evr, wire.ia_feat[real])
        p = np.minimum(p, nreal - 1)
        if not np.array_equal(evr[p], wire.ia_feat[real]):
            return None
        pos[real] = p

    # --- mailbox plan must be identity-indexed --------------------------
    W = int(wire.mw_node.shape[0])
    if W != 2 * B:
        return None
    pw = np.arange(W)
    loc, side = pw >> 1, pw & 1
    node_raw = np.where(side == 0, ev_src[loc], ev_dst[loc])
    part_raw = np.where(side == 0, ev_dst[loc], ev_src[loc])
    mvalid = np.asarray(wire.mw_node) != N
    minv = ~mvalid
    if not (np.array_equal(wire.mw_node[mvalid], node_raw[mvalid])
            and np.array_equal(wire.mw_partner[mvalid], part_raw[mvalid])
            and np.array_equal(wire.mw_t[mvalid],
                               np.asarray(wire.ev_t)[loc][mvalid])
            and np.array_equal(wire.mw_eid[mvalid], ev_idx[loc][mvalid])
            and np.all(wire.mw_partner[minv] == 0)
            and np.all(wire.mw_t[minv] == 0)
            and np.all(wire.mw_eid[minv] == 0)
            and np.all(wire.mw_slot[minv] == 0)):
        return None
    if mailbox_size <= 254:
        mw_slot = np.where(mvalid, wire.mw_slot, 255).astype(np.uint8)
    else:
        mw_slot = np.where(mvalid, wire.mw_slot, -1).astype(np.int32)

    def enc(a, maxval):
        a = np.asarray(a)
        if maxval <= 0xFFFF:
            return a.astype(np.uint16)
        return a.astype(np.int32)

    def enc_rslot(a):
        if a is None:
            return None
        a = np.asarray(a)
        if R - 1 <= 0xFFFE:
            return np.where(a < 0, 0xFFFF, a).astype(np.uint16)
        return a.astype(np.int32)

    return CompactWire(
        ev_src=enc(ev_src, N - 1), ev_dst=enc(ev_dst, N - 1),
        ev_t=np.asarray(wire.ev_t, np.float32),
        ev_idx=ev_idx.astype(np.int32),
        ev_valid=np.asarray(wire.ev_valid, bool),
        ev_neg=enc(wire.ev_neg, N - 1),
        ev_src_slot=enc(wire.ev_src_slot, R - 1),
        ev_pos_slot=enc(wire.ev_pos_slot, R - 1),
        ev_neg_slot=enc(wire.ev_neg_slot, R - 1),
        uniq_nid=enc(wire.uniq_nid, N),
        root_loc=enc(wire.root_loc, Ub - 1),
        cache_loc=enc(wire.cache_loc, Ub - 1),
        cache_feat=np.asarray(wire.cache_feat, np.int32),
        cache_dt=np.asarray(wire.cache_dt, np.float32),
        self_dt=np.asarray(wire.self_dt, np.float32),
        ia_row=enc(ia_row, R),
        ia_col=(np.asarray(wire.ia_col).astype(np.uint8)
                if intra_width <= 256 else
                np.asarray(wire.ia_col, np.int32)),
        ia_loc=enc(wire.ia_loc, Ub - 1),
        ia_pos=enc(pos, B - 1),
        ia_dt=np.asarray(wire.ia_dt, np.float32),
        mw_slot=mw_slot,
        cache_rslot=enc_rslot(wire.cache_rslot),
        ia_rslot=enc_rslot(wire.ia_rslot),
    )


def uncompact_wire(cw: CompactWire, num_nodes: int) -> WirePack:
    """Device-side inverse of compact_wire (pure jnp, runs inside the
    jitted step; everything is casts/gathers/selects that XLA fuses into
    the expand).  Output is bit-equal to the original WirePack —
    tests/test_wire.py::test_compact_wire_exact."""
    def i32(a):
        return a.astype(jnp.int32)

    ev_src, ev_dst = i32(cw.ev_src), i32(cw.ev_dst)
    ev_idx = i32(cw.ev_idx)
    R = cw.root_loc.shape[0]
    ia_row = i32(cw.ia_row)
    ia_feat = jnp.where(ia_row == R, 0, ev_idx[i32(cw.ia_pos)])

    def rslot(a):
        if a is None:
            return None
        a32 = i32(a)
        if a.dtype == jnp.uint16:
            return jnp.where(a32 == 0xFFFF, -1, a32)
        return a32

    W = cw.mw_slot.shape[0]
    pw = jnp.arange(W, dtype=jnp.int32)
    loc, side = pw >> 1, pw & 1
    if cw.mw_slot.dtype == jnp.uint8:
        mvalid = cw.mw_slot != 255
        mw_slot = jnp.where(mvalid, i32(cw.mw_slot), 0)
    else:
        mvalid = cw.mw_slot >= 0
        mw_slot = jnp.where(mvalid, cw.mw_slot, 0)
    node_raw = jnp.where(side == 0, ev_src[loc], ev_dst[loc])
    part_raw = jnp.where(side == 0, ev_dst[loc], ev_src[loc])
    return WirePack(
        ev_src=ev_src, ev_dst=ev_dst, ev_t=cw.ev_t, ev_idx=ev_idx,
        ev_valid=cw.ev_valid, ev_neg=i32(cw.ev_neg),
        ev_src_slot=i32(cw.ev_src_slot), ev_pos_slot=i32(cw.ev_pos_slot),
        ev_neg_slot=i32(cw.ev_neg_slot),
        uniq_nid=i32(cw.uniq_nid), root_loc=i32(cw.root_loc),
        cache_loc=i32(cw.cache_loc), cache_feat=cw.cache_feat,
        cache_dt=cw.cache_dt, self_dt=cw.self_dt,
        ia_row=ia_row, ia_col=i32(cw.ia_col), ia_loc=i32(cw.ia_loc),
        ia_feat=ia_feat, ia_dt=cw.ia_dt,
        mw_node=jnp.where(mvalid, node_raw, num_nodes),
        mw_slot=mw_slot,
        mw_partner=jnp.where(mvalid, part_raw, 0),
        mw_t=jnp.where(mvalid, cw.ev_t[loc], 0.0),
        mw_eid=jnp.where(mvalid, ev_idx[loc], 0),
        cache_rslot=rslot(cw.cache_rslot),
        ia_rslot=rslot(cw.ia_rslot),
    )


class DedupWire(NamedTuple):
    """Deduplicated narrow wire (train.wire_dedup) — ~1.6× fewer H2D
    bytes than a CompactWire, expanded by PURE GATHERS (no scatter — the
    CompactWire's intra-COO expansion costs 4 scatter kernels, and on
    remote/tunneled backends every kernel carries a fixed dispatch
    overhead).

    Two structural observations make the shrink exact:

      * The recency cache is PRE-BATCH state (inserts land after packing,
        reference epoch_utils.py:300 vs :220), so every root slot of the
        same node carries an identical cache row — rows ship once per
        unique root node (``cr_loc``/``cr_feat``, (Ur, K)) plus a
        slot→row map (``root_cr``).
      * The intra-batch in-edges of a root slot are a CONTIGUOUS window
        of its node's event entries (data/packer.py pass-1 runs), so
        the COO collapses to per-slot (lo, cnt) ranges into one
        node-major entry table (``ne_ent``, (2B, 2) int32 =
        [partner uniq-loc, global event row]); the Δt values ship as
        one prefix-layout list (``ia_dt``, indexed by ``intra_start``).
        Shipping partner/eid per entry (vs re-deriving them on device
        from the event arrays) turns the intra expansion into ONE row
        gather — the re-derivation cost an element gather plus a packed
        (R, P, 4) event-table gather and compare/select chains, together
        the hottest ops of the profiled step (BASELINE.md).

    Δt values ship precomputed (cache_dt/self_dt/ia_dt): deriving them
    on device from a per-(node, block) clock replay is exact but needs
    either scatters + a cummax or a sort + unrolled binary search —
    measured 63K e/s (scatter) and 35K e/s (search) vs 100K+ shipping
    dt, because each extra kernel costs ~0.8 ms fixed on the tunneled
    backend (BASELINE.md).  ``expand_dedup`` reconstructs the full
    DevicePack bit-exactly (tests/test_wire.py::test_dedup_wire_exact).
    Multi-layer (gnn.layer > 1) runs need per-slot rslot indices, which
    do not dedup — they use the CompactWire path instead.
    """

    ev_src: jnp.ndarray        # (B,) u16|i32
    ev_dst: jnp.ndarray        # (B,) u16|i32
    ev_t: jnp.ndarray          # (B,) f32
    ev_idx: jnp.ndarray        # (B,) i32 global msg-table rows
    ev_valid: jnp.ndarray      # (B,) bool
    ev_neg: jnp.ndarray        # (B,)|(B,M) u16|i32
    ev_src_slot: jnp.ndarray   # (B,) u16|i32
    ev_pos_slot: jnp.ndarray   # (B,) u16|i32
    ev_neg_slot: jnp.ndarray   # (B,)|(B,M) u16|i32
    uniq_nid: jnp.ndarray      # (Ub,) u16|i32 (pad = num_nodes)
    root_loc: jnp.ndarray      # (R,) u16|i32 (pad = Ub-1)
    root_cr: jnp.ndarray       # (R,) u16|i32 row in the cr tables
    cr_loc: jnp.ndarray        # (Ur, K) u16|i32 per unique root node
    cr_feat: jnp.ndarray       # (Ur, K) i32 global e_id; -1 = empty
    cache_dt: jnp.ndarray      # (R, K) f32
    self_dt: jnp.ndarray       # (R,) f32
    ne_ent: jnp.ndarray        # (2B, 2) i32 node-major event entries:
                               # [partner uniq-loc, global event row]
    intra_lo: jnp.ndarray      # (R,) u16|i32 window start into ne_ent
    intra_cnt: jnp.ndarray     # (R,) u8 window length (≤ P)
    intra_start: jnp.ndarray   # (R,) u16|i32 window start into ia_dt
    ia_dt: jnp.ndarray         # (Ei,) f32 prefix-layout intra Δt values
    mw_slot: jnp.ndarray       # (2B,) u8 (255 = no write) | i32 (-1)
    # --- eval-lean extension (eval_lean_dedup): Δt grids derive on
    # device instead of shipping; cache_dt/self_dt/ia_dt become None ---
    # block ids ship u8 when the static block bucket fits (≤256 levels),
    # u16 otherwise (review-scale batches with max_intra_block=None can
    # exceed 255 dependency levels — VERDICT r4 weak-5)
    root_blk: Optional[jnp.ndarray] = None   # (R,) u8|u16 block of slot
    ev_blk: Optional[jnp.ndarray] = None     # (B,) u8|u16 block of event
    blk_max: Optional[jnp.ndarray] = None    # (NBb,) f32 per-block wipe
                                             # value (block max time)
    # endpoint uniq-locs (precomputed host-side so the clock-grid build
    # never reads the (R,) root_loc table — root-slot fields may arrive
    # SLICED in the slot-unique eval's embed chunks)
    ev_src_loc: Optional[jnp.ndarray] = None  # (B,) i32
    ev_dst_loc: Optional[jnp.ndarray] = None  # (B,) i32
    # --- train-lean extension (train_lean_dedup): pre-batch clock rows
    # for the uniq table; the in-batch clock evolution (packer pass-2,
    # data/packer.py:410-421) re-derives on device from the event
    # arrays, so the three per-slot f32 Δt fields drop from TRAIN wires
    # too (~55% of the train wire bytes).  None on eval/full wires. ---
    clock0: Optional[jnp.ndarray] = None     # (Ub,) f32


def nb_bucket_of(blocks) -> int:
    """Pow2 (floor 16) bucket for a split's dependency-block count —
    the STATIC shape every lean-wire consumer keys its compiled
    signature on.  One definition shared by the train-lean, eval-lean
    and slot-unique paths across all engines: a floor/growth change
    that landed in only one call site would split their compiled
    buckets and trigger 20-300 s XLA recompiles mid-pass on tunneled
    backends."""
    nb_max = int(blocks.max()) + 1 if len(blocks) else 1
    b = 16
    while b < nb_max:
        b *= 2
    return b


def _lean_block_meta(wire: DedupWire, blocks, nb_bucket: int):
    """Shared block-metadata derivation for BOTH lean wire post-passes
    (eval_lean_dedup / train_lean_dedup): the u8/u16 id-field gate and
    the per-event / per-root-slot block ids, scattered through the slot
    maps (every root is referenced by at least one event of its own
    block — roots are unique(src ∪ dst ∪ neg) per block).  Returns
    (ev_blk, root_blk, src_slot, pos_slot), or None when the block
    count overflows the id field.  One definition so the block-id
    representation can never desynchronize between train and eval."""
    braw = len(blocks)
    blocks = np.asarray(blocks)
    nb = int(blocks.max()) + 1
    if nb > min(nb_bucket, 65536):
        return None
    blk_dt = np.uint8 if nb_bucket <= 256 else np.uint16
    B = np.asarray(wire.ev_t).shape[0]
    R = np.asarray(wire.root_loc).shape[0]
    ev_blk = np.zeros(B, blk_dt)
    ev_blk[:braw] = blocks.astype(blk_dt)
    root_blk = np.zeros(R, blk_dt)
    src_slot = np.asarray(wire.ev_src_slot, np.int64)
    pos_slot = np.asarray(wire.ev_pos_slot, np.int64)
    root_blk[src_slot[:braw]] = ev_blk[:braw]
    root_blk[pos_slot[:braw]] = ev_blk[:braw]
    neg_slot = np.asarray(wire.ev_neg_slot, np.int64)
    neg2d = neg_slot.reshape(B, -1)[:braw]
    root_blk[neg2d] = ev_blk[:braw, None]
    return ev_blk, root_blk, src_slot, pos_slot


def eval_lean_dedup(wire: DedupWire, blocks, nb_bucket: int):
    """Host post-pass for EVAL dedup wires: drop the three per-slot f32
    Δt fields (cache_dt/self_dt/ia_dt — the largest wire fields at
    M=999 chunk scale) and attach the tiny block metadata expand_dedup's
    lean branch needs to re-derive them bit-exactly on device (see its
    docstring).  ``blocks`` is the (B_raw,) per-event dependency block
    array the chunk was packed with; ``nb_bucket`` the static block-
    count bucket (caller keeps it stable across a pass for one compiled
    signature).  Returns the wire unchanged when the block count
    overflows the id field (u8 for buckets ≤256, u16 above — the dtype
    depends only on the STATIC bucket so jit signatures stay stable), or
    when the batch carries negative event times — the device clock grid
    uses a −1 "no event" sentinel, so negative timestamps would corrupt
    the eval clock wipe silently (ADVICE r4); such datasets ship the
    full wire instead."""
    braw = len(blocks)
    if braw == 0:
        return wire
    blocks = np.asarray(blocks)
    t = np.asarray(wire.ev_t)[:braw]
    if braw and t.min() < 0:
        return wire
    meta = _lean_block_meta(wire, blocks, nb_bucket)
    if meta is None:
        return wire
    ev_blk, root_blk, src_slot, pos_slot = meta
    R = np.asarray(wire.root_loc).shape[0]
    # per-block wipe value = the block's max event time (packer.py:389)
    blk_max = np.zeros(nb_bucket, np.float32)
    np.maximum.at(blk_max, blocks, t)
    # endpoint uniq-locs for the device clock-grid build (see the
    # DedupWire field comment): root_loc composed with the slot maps,
    # resolved HERE so chunked consumers never index the full table
    root_loc = np.asarray(wire.root_loc, np.int64)
    ev_src_loc = root_loc[np.clip(src_slot, 0, R - 1)].astype(np.int32)
    ev_dst_loc = root_loc[np.clip(pos_slot, 0, R - 1)].astype(np.int32)
    return wire._replace(cache_dt=None, self_dt=None, ia_dt=None,
                         root_blk=root_blk, ev_blk=ev_blk,
                         blk_max=blk_max, ev_src_loc=ev_src_loc,
                         ev_dst_loc=ev_dst_loc)


def train_lean_dedup(wire: DedupWire, blocks, nb_bucket: int,
                     clock_before):
    """Host post-pass for TRAIN dedup wires: drop the three per-slot
    f32 Δt fields (cache_dt/self_dt/ia_dt — ~55% of the train wire's
    bytes; H2D bandwidth is ~half the per-group wall on tunneled
    hosts, BASELINE.md round 5) and attach what expand_dedup's
    train-lean branch needs to re-derive them BIT-EXACTLY on device:

      * ``clock0`` — the PRE-BATCH persistent clock rows for the uniq
        table (``clock_before`` is the packer's clock array snapshot
        taken before this batch advanced it);
      * ``root_blk``/``ev_blk`` — the same block metadata the
        eval-lean wire ships (u8/u16 by the static ``nb_bucket``).

    Unlike eval mode there is no per-block wipe (blk_max stays None —
    that is how the device expansion distinguishes the two lean
    branches), and no timestamp-sign restriction: the device clock
    grid uses an order-key sentinel, not a negative-time sentinel.
    Returns the wire unchanged when the block count overflows the id
    field."""
    braw = len(blocks)
    if braw == 0:
        return wire
    neg_slot = np.asarray(wire.ev_neg_slot, np.int64)
    if neg_slot.ndim != 1:
        return wire          # train wires carry one negative per event
    B = np.asarray(wire.ev_t).shape[0]
    # order-key width guard: the device reconstruction encodes each
    # clock write as kkey = blk·3B + role·B + row + 1 in INT32 (x64 is
    # off under jit), so the max key 3·B·nb_bucket must fit — the u16
    # block gate alone allows B·nb combinations past 2^31 (B ≥ ~27K on
    # a hub-heavy stream), where wrapped keys would silently pick the
    # wrong last write.  Overflowing batches ship the full Δt wire.
    if 3 * B * nb_bucket >= 2 ** 31:
        return wire
    meta = _lean_block_meta(wire, blocks, nb_bucket)
    if meta is None:
        return wire
    ev_blk, root_blk, _src_slot, _pos_slot = meta
    uniq = np.asarray(wire.uniq_nid, np.int64)
    N = clock_before.shape[0]
    clock0 = np.where(uniq >= N, 0.0,
                      np.asarray(clock_before, np.float32)[
                          np.minimum(uniq, N - 1)]).astype(np.float32)
    return wire._replace(cache_dt=None, self_dt=None, ia_dt=None,
                         root_blk=root_blk, ev_blk=ev_blk,
                         # zeros: carries the static block-bucket width
                         # for the device grid (the eval branch's wipe
                         # table reused as a shape carrier)
                         blk_max=np.zeros(nb_bucket, np.float32),
                         clock0=clock0)


def _mw_from_slots(mw_slot, ev_src, ev_dst, ev_t, ev_idx, num_nodes):
    """Identity-indexed mailbox plan reconstruction (see CompactWire):
    position i = (event i>>1, direction i&1)."""
    W = mw_slot.shape[0]
    pw = jnp.arange(W, dtype=jnp.int32)
    loc, side = pw >> 1, pw & 1
    if mw_slot.dtype == jnp.uint8:
        mvalid = mw_slot != 255
        slot = jnp.where(mvalid, mw_slot.astype(jnp.int32), 0)
    else:
        mvalid = mw_slot >= 0
        slot = jnp.where(mvalid, mw_slot, 0)
    node_raw = jnp.where(side == 0, ev_src[loc], ev_dst[loc])
    part_raw = jnp.where(side == 0, ev_dst[loc], ev_src[loc])
    return (jnp.where(mvalid, node_raw, num_nodes), slot,
            jnp.where(mvalid, part_raw, 0),
            jnp.where(mvalid, ev_t[loc], 0.0),
            jnp.where(mvalid, ev_idx[loc], 0))


def expand_dedup(wire: DedupWire, num_neighbors: int, intra_width: int,
                 num_nodes: int, ev_times=None) -> DevicePack:
    """Device-side reconstruction of the full DevicePack from a
    DedupWire (pure jnp, runs inside the jitted step; gathers only, so
    XLA fuses the whole expansion into the consuming model pass).
    Bit-equivalent to Pack.device() — tests/test_wire.py.

    EVAL-LEAN mode (``wire.cache_dt is None``, built by
    ``eval_lean_dedup``): the Δt grids derive ON DEVICE instead of
    shipping.  Every eval Δt is ``edge time − clock_b[node]`` where the
    clock state of block b is: the per-block wipe value (the block's
    max event time, packer.py:388-389) OVERWRITTEN by the block's own
    endpoint writes (dst then src with their exact event times,
    packer.py:392-393 — unconditional, also in eval mode).  Both parts
    reconstruct exactly from what the wire already carries:

      * edge times  = rows of the device-resident global time table
        (``ev_times``) at the global e_ids in cr_feat / ne_ent[:, 1];
      * clock_b[u]  = u's max event time within block b when u is an
        endpoint there (a (Ub, NBb) scatter-max over the batch's events,
        whose uniq-locs come from root_loc[ev_src/pos_slot] — every
        endpoint is a root of its own block), else the shipped per-block
        wipe value ``blk_max[b]`` (times are sorted, so max-within-block
        equals the LAST write, the serial semantics).

    This drops the three per-slot f32 Δt fields — at M=999 eval chunk
    scale ~2.1 of 2.9 MB per chunk (BASELINE.md round 4) — for one
    scatter-max plus gathers that fuse into the consumers.  Train-mode
    wires are unaffected: their clocks carry cross-batch state the
    device does not have."""
    K = num_neighbors
    P = intra_width
    lean_dt = wire.cache_dt is None
    if lean_dt:
        assert ev_times is not None, (
            "eval-lean DedupWire needs the device time table")

    def i32(a):
        return a.astype(jnp.int32)

    R = wire.root_loc.shape[0]
    Ub = wire.uniq_nid.shape[0]
    pad_loc = Ub - 1
    ev_src, ev_dst = i32(wire.ev_src), i32(wire.ev_dst)
    ev_idx = i32(wire.ev_idx)
    ev_t = wire.ev_t
    root_loc = i32(wire.root_loc)
    root_cr = i32(wire.root_cr)
    root_valid = root_loc != pad_loc
    uniq_nid = i32(wire.uniq_nid)
    src_slot, pos_slot = i32(wire.ev_src_slot), i32(wire.ev_pos_slot)

    if lean_dt and wire.clock0 is not None:
        # ---- TRAIN clock reconstruction (train_lean_dedup) -------------
        # The packer's pass-2 clock (data/packer.py:410-421): per block,
        # vectorized writes in role order neg → dst → src (last-write-
        # wins), reading the value AFTER the root's own block.  Encode
        # each write as an ORDER KEY kkey = blk·3B + role·B + row + 1
        # (0 = never written): max kkey over a (u, blk) cell IS the
        # block's last write, and because blk dominates the key, an
        # inclusive cummax along the block axis gives the last write in
        # blocks ≤ b.  The written VALUE recovers as ev_t[(kkey−1) mod
        # B] (blk·3B and role·B vanish mod B).  Cells never written
        # fall back to the shipped pre-batch clock0.  ONE scatter-max +
        # ONE cummax; every Δt below is then the same f32 subtraction
        # the host performed — bit-exact
        # (tests/test_wire.py::test_dedup_wire_train_lean_exact).
        NBb = wire.blk_max.shape[0]      # zeros carrier: static width
        root_blk = i32(wire.root_blk)                    # (R,)
        ev_blk = i32(wire.ev_blk)                        # (B,)
        Bq = ev_src.shape[0]
        rows = jnp.arange(Bq, dtype=jnp.int32)
        loc_src = root_loc[src_slot]
        loc_dst = root_loc[pos_slot]
        loc_neg = root_loc[i32(wire.ev_neg_slot)]        # (B,) train M=1

        def kkey(role):
            return jnp.where(wire.ev_valid,
                             ev_blk * (3 * Bq) + role * Bq + rows + 1, 0)

        locs = jnp.concatenate([loc_neg, loc_dst, loc_src])
        blks = jnp.concatenate([ev_blk, ev_blk, ev_blk])
        keys = jnp.concatenate([kkey(0), kkey(1), kkey(2)])
        G = jnp.zeros((Ub, NBb), jnp.int32).at[locs, blks].max(keys)
        PG = jax.lax.cummax(G, axis=1)
        c0 = wire.clock0

        def clock_at(loc, blk):
            pg = PG[loc, blk]
            return jnp.where(pg > 0, wire.ev_t[(pg - 1) % Bq], c0[loc])
    elif lean_dt:
        # ---- per-(uniq node, block) eval clock reconstruction ----------
        # grid[u, b] = max event time of node u within block b (−1 when
        # u is not an endpoint of b); clock_b[u] = grid or the block's
        # wipe value.  ONE scatter-max over both event halves.
        NBb = wire.blk_max.shape[0]
        root_blk = i32(wire.root_blk)                    # (R,)
        ev_blk = i32(wire.ev_blk)                        # (B,)
        loc_src = i32(wire.ev_src_loc)
        loc_dst = i32(wire.ev_dst_loc)
        tval = jnp.where(wire.ev_valid, wire.ev_t, -1.0)
        grid = jnp.full((Ub, NBb), -1.0, jnp.float32)
        grid = grid.at[jnp.concatenate([loc_dst, loc_src]),
                       jnp.concatenate([ev_blk, ev_blk])].max(
                           jnp.concatenate([tval, tval]))

        def clock_at(loc, blk):
            g = grid[loc, blk]
            return jnp.where(g >= 0.0, g, wire.blk_max[blk])

    # ---- cache part (dedup per unique root node) -----------------------
    cache_loc = i32(wire.cr_loc)[root_cr]                # (R, K)
    cache_feat_raw = wire.cr_feat[root_cr]               # (R, K) i32
    cache_valid = cache_feat_raw >= 0
    cache_feat = jnp.maximum(cache_feat_raw, 0)
    if lean_dt:
        # padded root slots inherit cr row 0's validity, so mask by
        # root_valid too (the shipped field was zero there —
        # Pack.device() parity)
        cache_dt = jnp.where(
            cache_valid & root_valid[:, None],
            ev_times[cache_feat]
            - clock_at(cache_loc, root_blk[:, None]), 0.0)
    else:
        cache_dt = jnp.where(cache_valid, wire.cache_dt, 0.0)
    cache_kind = jnp.where(cache_valid, jnp.int8(KIND_CACHE),
                           jnp.int8(KIND_INVALID))
    cache_loc = jnp.where(cache_valid, cache_loc, pad_loc)

    # ---- self column ----------------------------------------------------
    if lean_dt:
        self_dt_raw = 0.0 - clock_at(root_loc, root_blk)
    else:
        self_dt_raw = wire.self_dt
    self_dt = jnp.where(root_valid, self_dt_raw, 0.0)
    self_kind = jnp.where(root_valid, jnp.int8(KIND_SELF),
                          jnp.int8(KIND_INVALID))

    # ---- intra part (per-slot ranges into ne_ent; Δt prefix list) -------
    if P > 0:
        ne = i32(wire.ne_ent)                  # (2B, 2) [partner_loc, eid]
        lo = i32(wire.intra_lo)
        cnt = i32(wire.intra_cnt)
        start = i32(wire.intra_start)
        j = jnp.arange(P, dtype=jnp.int32)[None, :]
        ia_valid = j < cnt[:, None]                                # (R, P)
        idx = jnp.clip(lo[:, None] + j, 0, ne.shape[0] - 1)
        g = ne[idx]                                             # (R, P, 2)
        ia_loc = jnp.where(ia_valid, g[..., 0], pad_loc)
        ia_feat = jnp.where(ia_valid, g[..., 1], 0)
        if lean_dt:
            # intra Δt = event time − partner clock at the root's block
            # (partner uniq-loc and the event's global row are already
            # gathered into g)
            ia_dt = jnp.where(
                ia_valid,
                ev_times[g[..., 1]]
                - clock_at(g[..., 0], root_blk[:, None]), 0.0)
        elif P % 4 == 0 and wire.ia_dt.shape[0] % 4 == 0:
            # windows are 4-aligned/4-padded by the packer: read the
            # prefix list as f32[4] ROW gathers (element gathers were
            # the hottest op of the profiled step — BASELINE.md)
            dt4 = wire.ia_dt.reshape(-1, 4)
            j4 = jnp.arange(P // 4, dtype=jnp.int32)[None, :]
            didx4 = jnp.clip(start[:, None] // 4 + j4, 0,
                             dt4.shape[0] - 1)
            ia_dt_raw = dt4[didx4].reshape(-1, P)        # (R, P)
            ia_dt = jnp.where(ia_valid, ia_dt_raw, 0.0)
        else:
            didx = jnp.clip(start[:, None] + j, 0, wire.ia_dt.shape[0] - 1)
            ia_dt = jnp.where(ia_valid, wire.ia_dt[didx], 0.0)
        ia_kind = jnp.where(ia_valid, jnp.int8(KIND_INTRA),
                            jnp.int8(KIND_INVALID))
        nbr_loc = jnp.concatenate(
            [cache_loc, jnp.where(root_valid, root_loc, pad_loc)[:, None],
             ia_loc], axis=1)
        nbr_feat = jnp.concatenate(
            [cache_feat, jnp.zeros((R, 1), jnp.int32), ia_feat], axis=1)
        nbr_dt = jnp.concatenate(
            [cache_dt, self_dt[:, None], ia_dt], axis=1)
        nbr_kind = jnp.concatenate(
            [cache_kind, self_kind[:, None], ia_kind], axis=1)
    else:
        nbr_loc = jnp.concatenate(
            [cache_loc,
             jnp.where(root_valid, root_loc, pad_loc)[:, None]], axis=1)
        nbr_feat = jnp.concatenate(
            [cache_feat, jnp.zeros((R, 1), jnp.int32)], axis=1)
        nbr_dt = jnp.concatenate([cache_dt, self_dt[:, None]], axis=1)
        nbr_kind = jnp.concatenate([cache_kind, self_kind[:, None]], axis=1)

    nid_table = jnp.where(uniq_nid == num_nodes, 0, uniq_nid)
    nbr_nid = jnp.where(nbr_kind != KIND_INVALID, nid_table[nbr_loc], 0)
    root_nid = jnp.where(root_valid, nid_table[root_loc], 0)

    mw_node, mw_slot, mw_partner, mw_t, mw_eid = _mw_from_slots(
        wire.mw_slot, ev_src, ev_dst, ev_t, ev_idx, num_nodes)

    return DevicePack(
        ev_src=ev_src, ev_dst=ev_dst, ev_t=ev_t, ev_idx=ev_idx,
        ev_valid=wire.ev_valid, ev_neg=i32(wire.ev_neg),
        root_nid=root_nid, root_valid=root_valid,
        nbr_nid=nbr_nid, nbr_dt=nbr_dt, nbr_kind=nbr_kind,
        nbr_feat=nbr_feat,
        ev_src_slot=src_slot, ev_pos_slot=pos_slot,
        ev_neg_slot=i32(wire.ev_neg_slot),
        uniq_nid=uniq_nid, root_loc=root_loc, nbr_loc=nbr_loc,
        mw_node=mw_node, mw_slot=mw_slot, mw_partner=mw_partner,
        mw_t=mw_t, mw_eid=mw_eid,
        nbr_rslot=None,
    )


def expand_any(wire, num_neighbors: int, statics, num_nodes: int,
               ev_times=None, eval_mode: bool = False,
               with_rslot: bool = False) -> DevicePack:
    """Expand whichever wire format arrived.  ``statics`` is the wire's
    static intra_width (int)."""
    iw = statics[0] if isinstance(statics, tuple) else statics
    if isinstance(wire, DedupWire):
        return expand_dedup(wire, num_neighbors, iw, num_nodes,
                            ev_times=ev_times)
    return expand_wire(wire, num_neighbors, iw, num_nodes)


def expand_wire(wire, num_neighbors: int, intra_width: int,
                num_nodes: int) -> DevicePack:
    """Device-side reconstruction of the full DevicePack (pure jnp; runs
    inside the jitted step).  Bit-equivalent to Pack.device() — verified
    by tests/test_wire.py.  Accepts a CompactWire transparently."""
    if isinstance(wire, CompactWire):
        wire = uncompact_wire(wire, num_nodes)
    K = num_neighbors
    P = intra_width
    R = wire.root_loc.shape[0]
    Ub = wire.uniq_nid.shape[0]
    pad_loc = Ub - 1

    root_nid = wire.uniq_nid[wire.root_loc]
    root_valid = wire.root_loc != pad_loc

    cache_valid = wire.cache_feat >= 0
    cache_kind = jnp.where(cache_valid, jnp.int8(KIND_CACHE),
                           jnp.int8(KIND_INVALID))
    cache_feat = jnp.maximum(wire.cache_feat, 0)
    self_kind = jnp.where(root_valid, jnp.int8(KIND_SELF),
                          jnp.int8(KIND_INVALID))
    self_dt = jnp.where(root_valid, wire.self_dt, 0.0)

    def scatter(init_val, vals, dtype):
        g = jnp.full((R + 1, P), init_val, dtype)
        g = g.at[wire.ia_row, wire.ia_col].set(vals.astype(dtype))
        return g[:R]

    # self-column rslot is the row's own slot (a root is always a root of
    # its own block); -1 on padding rows
    self_rslot = None
    if wire.cache_rslot is not None:
        self_rslot = jnp.where(root_valid,
                               jnp.arange(R, dtype=jnp.int32), -1)
    if P > 0:
        ia_loc = scatter(pad_loc, wire.ia_loc, jnp.int32)
        ia_feat = scatter(0, wire.ia_feat, jnp.int32)
        ia_dt = scatter(0.0, wire.ia_dt, jnp.float32)
        ia_kind = scatter(KIND_INVALID,
                          jnp.full(wire.ia_row.shape, KIND_INTRA),
                          jnp.int8)
        nbr_loc = jnp.concatenate(
            [wire.cache_loc, wire.root_loc[:, None], ia_loc], axis=1)
        nbr_feat = jnp.concatenate(
            [cache_feat, jnp.zeros((R, 1), jnp.int32), ia_feat], axis=1)
        nbr_dt = jnp.concatenate(
            [wire.cache_dt, self_dt[:, None], ia_dt], axis=1)
        nbr_kind = jnp.concatenate(
            [cache_kind, self_kind[:, None], ia_kind], axis=1)
        nbr_rslot = (jnp.concatenate(
            [wire.cache_rslot, self_rslot[:, None],
             scatter(-1, wire.ia_rslot, jnp.int32)], axis=1)
            if self_rslot is not None else None)
    else:
        nbr_loc = jnp.concatenate(
            [wire.cache_loc, wire.root_loc[:, None]], axis=1)
        nbr_feat = jnp.concatenate(
            [cache_feat, jnp.zeros((R, 1), jnp.int32)], axis=1)
        nbr_dt = jnp.concatenate([wire.cache_dt, self_dt[:, None]], axis=1)
        nbr_kind = jnp.concatenate([cache_kind, self_kind[:, None]], axis=1)
        nbr_rslot = (jnp.concatenate(
            [wire.cache_rslot, self_rslot[:, None]], axis=1)
            if self_rslot is not None else None)

    # invalid cells in the full pack carry nid 0 / loc pad; clamp the
    # trash-row uniq id (num_nodes) to 0 for nid parity with Pack.device()
    nid_table = jnp.where(wire.uniq_nid == num_nodes, 0, wire.uniq_nid)
    nbr_nid = jnp.where(nbr_kind != KIND_INVALID, nid_table[nbr_loc], 0)
    root_nid = jnp.where(root_valid, root_nid, 0)

    return DevicePack(
        ev_src=wire.ev_src, ev_dst=wire.ev_dst, ev_t=wire.ev_t,
        ev_idx=wire.ev_idx, ev_valid=wire.ev_valid, ev_neg=wire.ev_neg,
        root_nid=root_nid, root_valid=root_valid,
        nbr_nid=nbr_nid, nbr_dt=nbr_dt, nbr_kind=nbr_kind,
        nbr_feat=nbr_feat,
        ev_src_slot=wire.ev_src_slot, ev_pos_slot=wire.ev_pos_slot,
        ev_neg_slot=wire.ev_neg_slot,
        uniq_nid=wire.uniq_nid, root_loc=wire.root_loc, nbr_loc=nbr_loc,
        mw_node=wire.mw_node, mw_slot=wire.mw_slot,
        mw_partner=wire.mw_partner, mw_t=wire.mw_t, mw_eid=wire.mw_eid,
        nbr_rslot=nbr_rslot,
    )


_WIRE_CLASSES.update({
    "WirePack": WirePack,
    "CompactWire": CompactWire,
    "DedupWire": DedupWire,
})
