"""Lean wire: device-resident neighbor cache + clocks (device-cache mode).

The standard wire (ops/wire.py) ships host-gathered recency-cache grids —
(R, K) loc/feat/dt — every batch: ~1 MB of the ~1.8 MB/batch transfer.
Measured on the tunneled TPU, that H2D traffic (not dispatch count, not
compute) is the throughput wall once batches are dispatch-fused
(CLAUDE.md perf model).  The lean wire ships ONLY event-derived data and
keeps the streaming state (recency cache, per-node clocks) ON DEVICE:

  host (pure event processing, no O(N)-state gathers)
    * per-block root sets + event→slot maps (as before)
    * intra-batch COO as (row, event-pos, side) — features, Δt and the
      column index are all derivable on device
    * mailbox write plan (ring slots from the tiny host mail_ptr vector)
    * resolved per-(node, block) clock updates, sorted — the reference's
      sequential ``time_assoc`` writes (model_utils.py:77-83) collapse to
      "last write per (node, block)" which is a pure function of the
      batch's events/negatives
  device (inside the jitted step)
    * cache rows = gathers from the resident NeighborCacheState
      (ops/neighbor_cache.py — bit-exact twin of the reference's
      LastNeighborLoader, neighbor_loader.py:15-109)
    * clock-at-block queries via searchsorted over the update list
    * Δt grids, edge features, kind masks → the SAME DevicePack the
      model consumes; cache insert + clock advance close the step

Clock query semantics (reference model_utils.py:68-83):
  * train: clock(n, blk) = t of n's LAST write in blocks ≤ blk
    (write priority within a block: neg < dst < src, last event wins),
    else the pre-batch clock table.
  * eval (2-D negatives): each block first wipes ALL clocks to the block
    max-t (model_utils.py:78-79), then writes dst/src — so
    clock(n, blk) = t of n's last src/dst write IN block blk exactly,
    else wipe_t[blk].
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..data.packer import (KIND_CACHE, KIND_INTRA, KIND_INVALID, KIND_SELF,
                           DevicePack)
from ..ops.neighbor_cache import NeighborCacheState


class LeanWire(NamedTuple):
    """Host→device payload; every leading dim is a sticky shape bucket."""

    ev_src: jnp.ndarray       # (B,) int32
    ev_dst: jnp.ndarray       # (B,)
    ev_t: jnp.ndarray         # (B,) float32
    ev_idx: jnp.ndarray       # (B,) int32 global msg-table row
    ev_valid: jnp.ndarray     # (B,) bool
    ev_neg: jnp.ndarray       # (B,) or (B, M) int32
    ev_src_slot: jnp.ndarray  # (B,) int32
    ev_pos_slot: jnp.ndarray  # (B,)
    ev_neg_slot: jnp.ndarray  # (B,) or (B, M)
    root_nid: jnp.ndarray     # (R,) int32; padding rows = N
    root_blk: jnp.ndarray     # (R,) int32 dependency block of the slot
    # intra-batch in-edges, sorted by (row asc, col asc); padding row = R
    ia_row: jnp.ndarray       # (Ei,) int32
    ia_pos: jnp.ndarray       # (Ei,) int32 event position in [0, B)
    ia_side: jnp.ndarray      # (Ei,) int32 1 = partner is ev_src[pos]
    # mailbox write plan (unchanged from WirePack)
    mw_node: jnp.ndarray      # (2B,) int32, invalid = N
    mw_slot: jnp.ndarray
    mw_partner: jnp.ndarray
    mw_t: jnp.ndarray
    mw_eid: jnp.ndarray
    # resolved clock updates, sorted by (node, block); padding node = N
    upd_node: jnp.ndarray     # (Q,) int32
    upd_blk: jnp.ndarray      # (Q,) int32
    upd_t: jnp.ndarray        # (Q,) float32
    upd_last: jnp.ndarray     # (Q,) bool — last entry of its node run
    # eval-mode per-block global wipe values (max t per block); (Kb,)
    wipe_t: jnp.ndarray
    # scalar: final global wipe value (eval) — max t over real events
    wipe_final: jnp.ndarray   # () float32


class StreamDeviceState(NamedTuple):
    """Device-resident streaming state (device-cache mode): the recency
    cache + per-node clocks.  Arrays sized N+1 (row N = trash for padded
    events)."""

    cache: NeighborCacheState   # arrays (N+1, K)
    clock: jnp.ndarray          # (N+1,) float32


def init_stream_device_state(num_nodes: int, k: int) -> StreamDeviceState:
    from ..ops.neighbor_cache import init_neighbor_cache

    return StreamDeviceState(cache=init_neighbor_cache(num_nodes + 1, k),
                             clock=jnp.zeros(num_nodes + 1, jnp.float32))


def reset_stream_cache(st: StreamDeviceState) -> StreamDeviceState:
    """Train-epoch-start reset: cache wiped, clocks persist (reference
    epoch_utils.py:175; time_assoc never resets)."""
    from ..ops.neighbor_cache import reset_neighbor_cache

    return StreamDeviceState(cache=reset_neighbor_cache(st.cache),
                             clock=st.clock)


def _ss(a, v, side):
    """jnp.searchsorted with the UNROLLED binary search: the default
    'scan' method lowers to a lax.while whose per-step kernel-launch
    overhead dominated the lean step on TPU (~370 ms per fused group,
    profiler-verified); 'scan_unrolled' emits straight-line code."""
    return jnp.searchsorted(a, v, side=side, method="scan_unrolled")


def _clock_at(wire: LeanWire, clock_table, q_node, q_blk, *,
              eval_mode: bool, batch_size: int):
    """Vectorized clock-at-block query (see module docstring).

    Monotone composite key: entries are sorted by (node, blk), so
    first-occurrence-position(node) * (B+1) + blk is strictly increasing
    (blk < B always — every block holds ≥ 1 event) and fits int32."""
    q_shape = q_node.shape
    qn = q_node.reshape(-1)
    qb = q_blk.reshape(-1)
    mult = batch_size + 1
    first_occ = _ss(wire.upd_node, wire.upd_node, "left")
    entry_key = first_occ.astype(jnp.int32) * mult + wire.upd_blk
    q_first = _ss(wire.upd_node, qn, "left")
    q_key = q_first.astype(jnp.int32) * mult + qb
    hi = _ss(entry_key, q_key, "right") - 1
    his = jnp.maximum(hi, 0)
    match = (hi >= 0) & (wire.upd_node[his] == qn)
    if eval_mode:
        # block wipe erases earlier writes: only EXACT-block writes count
        match = match & (wire.upd_blk[his] == qb)
        base = wire.wipe_t[jnp.clip(qb, 0, wire.wipe_t.shape[0] - 1)]
    else:
        base = clock_table[qn]
    out = jnp.where(match, wire.upd_t[his], base)
    return out.reshape(q_shape)


def expand_lean(
    wire: LeanWire,
    state: StreamDeviceState,
    num_neighbors: int,
    intra_width: int,
    num_nodes: int,
    *,
    eval_mode: bool,
    batch_size: int,
) -> Tuple[DevicePack, jnp.ndarray]:
    """Rebuild the full DevicePack on device from the lean wire + the
    resident stream state.  Returns (pack, nid_list) where nid_list
    (R*(K+1),) = [root nids ⊕ cache-cell nids] is the (duplicated) memory
    read set replacing the host uniq table: apply_mail is a pure gather/
    compute, so duplicates recompute identical rows; commit's duplicate
    scatters all carry the same value and are therefore order-safe."""
    K = num_neighbors
    P = intra_width
    R = wire.root_nid.shape[0]
    N = num_nodes

    root_valid = wire.root_nid != N
    root_nid = jnp.where(root_valid, wire.root_nid, 0)
    rblk = jnp.where(root_valid, wire.root_blk, 0)

    # ---- cache rows from the device-resident state -------------------
    c_nbr = state.cache.neighbors[wire.root_nid]          # (R, K)
    c_eid = state.cache.e_id[wire.root_nid]
    c_t = state.cache.t[wire.root_nid]
    c_valid = (c_eid >= 0) & root_valid[:, None]
    c_nbr = jnp.where(c_valid, c_nbr, 0)

    # ---- intra-batch COO ------------------------------------------------
    Ei = wire.ia_row.shape[0]
    ia_real = wire.ia_row < R
    pos = jnp.clip(wire.ia_pos, 0, wire.ev_src.shape[0] - 1)
    partner = jnp.where(wire.ia_side == 1, wire.ev_src[pos],
                        wire.ev_dst[pos])
    partner_slot = jnp.where(wire.ia_side == 1, wire.ev_src_slot[pos],
                             wire.ev_pos_slot[pos])
    ia_blk = jnp.where(ia_real, wire.root_blk[jnp.minimum(wire.ia_row,
                                                          R - 1)], 0)

    # ---- ONE merged clock-at-block query for all three edge kinds ------
    q_node = jnp.concatenate([c_nbr.reshape(-1), root_nid, partner])
    q_blk = jnp.concatenate([jnp.repeat(rblk, K), rblk, ia_blk])
    clk = _clock_at(wire, state.clock, q_node, q_blk,
                    eval_mode=eval_mode, batch_size=batch_size)
    c_clock = clk[:R * K].reshape(R, K)
    self_clock = clk[R * K:R * K + R]
    p_clock = clk[R * K + R:]

    cache_dt = jnp.where(c_valid, c_t - c_clock, 0.0)
    cache_kind = jnp.where(c_valid, jnp.int8(KIND_CACHE),
                           jnp.int8(KIND_INVALID))
    cache_feat = jnp.where(c_valid, c_eid, 0)
    self_dt = jnp.where(root_valid, 0.0 - self_clock, 0.0)
    self_kind = jnp.where(root_valid, jnp.int8(KIND_SELF),
                          jnp.int8(KIND_INVALID))
    ia_dt = jnp.where(ia_real, wire.ev_t[pos] - p_clock, 0.0)
    ia_feat = jnp.where(ia_real, wire.ev_idx[pos], 0)
    # column = rank within the row (entries sorted by (row, col))
    ia_col = (jnp.arange(Ei, dtype=jnp.int32)
              - _ss(wire.ia_row, wire.ia_row, "left").astype(jnp.int32))

    def scatter(init_val, vals, dtype):
        g = jnp.full((R + 1, max(P, 1)), init_val, dtype)
        row = jnp.where(ia_real, wire.ia_row, R)
        g = g.at[row, ia_col].set(vals.astype(dtype))
        return g[:R]

    if P > 0:
        g_nid = scatter(0, partner, jnp.int32)
        g_slot = scatter(R, partner_slot, jnp.int32)
        g_feat = scatter(0, ia_feat, jnp.int32)
        g_dt = scatter(0.0, ia_dt, jnp.float32)
        g_kind = scatter(KIND_INVALID,
                         jnp.full((Ei,), KIND_INTRA, jnp.int8), jnp.int8)
        nbr_nid = jnp.concatenate([c_nbr, root_nid[:, None], g_nid], 1)
        nbr_dt = jnp.concatenate([cache_dt, self_dt[:, None], g_dt], 1)
        nbr_kind = jnp.concatenate([cache_kind, self_kind[:, None],
                                    g_kind], 1)
        nbr_feat = jnp.concatenate([cache_feat,
                                    jnp.zeros((R, 1), jnp.int32),
                                    g_feat], 1)
    else:
        nbr_nid = jnp.concatenate([c_nbr, root_nid[:, None]], 1)
        nbr_dt = jnp.concatenate([cache_dt, self_dt[:, None]], 1)
        nbr_kind = jnp.concatenate([cache_kind, self_kind[:, None]], 1)
        nbr_feat = jnp.concatenate([cache_feat,
                                    jnp.zeros((R, 1), jnp.int32)], 1)

    # ---- local memory table: [roots (R) ⊕ cache cells (R*K)] ----------
    # locs: root r → r; cache (r, j) → R + r*K + j; self → r; intra →
    # the partner's own root slot (same node ⇒ same memory row).
    root_loc = jnp.arange(R, dtype=jnp.int32)
    cache_loc = (R + jnp.arange(R * K, dtype=jnp.int32)).reshape(R, K)
    if P > 0:
        g_loc = scatter(R, partner_slot, jnp.int32)  # slot index < R
        nbr_loc = jnp.concatenate([cache_loc, root_loc[:, None], g_loc], 1)
    else:
        nbr_loc = jnp.concatenate([cache_loc, root_loc[:, None]], 1)
    nid_list = jnp.concatenate([
        jnp.where(root_valid, root_nid, N),
        jnp.where(c_valid, c_nbr, N).reshape(-1),
    ])

    pack = DevicePack(
        ev_src=wire.ev_src, ev_dst=wire.ev_dst, ev_t=wire.ev_t,
        ev_idx=wire.ev_idx, ev_valid=wire.ev_valid, ev_neg=wire.ev_neg,
        root_nid=root_nid, root_valid=root_valid,
        nbr_nid=jnp.where(nbr_kind != KIND_INVALID, nbr_nid, 0),
        nbr_dt=nbr_dt, nbr_kind=nbr_kind, nbr_feat=nbr_feat,
        ev_src_slot=wire.ev_src_slot, ev_pos_slot=wire.ev_pos_slot,
        ev_neg_slot=wire.ev_neg_slot,
        uniq_nid=nid_list, root_loc=root_loc, nbr_loc=nbr_loc,
        mw_node=wire.mw_node, mw_slot=wire.mw_slot,
        mw_partner=wire.mw_partner, mw_t=wire.mw_t, mw_eid=wire.mw_eid,
    )
    return pack, nid_list


def advance_stream(
    state: StreamDeviceState,
    wire: LeanWire,
    num_nodes: int,
    *,
    eval_mode: bool,
) -> StreamDeviceState:
    """Close the batch: insert events into the device cache (undirected
    last-K-by-e_id merge — reference neighbor_loader.py:52-104) and
    advance clocks to their post-batch values."""
    from ..ops.neighbor_cache import NeighborCacheState as NCS

    N = num_nodes
    valid = wire.ev_valid
    src = jnp.where(valid, wire.ev_src, N)   # padded events → trash row
    dst = jnp.where(valid, wire.ev_dst, N)
    cache = _insert_with_eid(state.cache, src, dst, wire.ev_t,
                             jnp.where(valid, wire.ev_idx, -1))
    if eval_mode:
        clock = jnp.full_like(state.clock, wire.wipe_final)
    else:
        clock = state.clock
    node = jnp.where(wire.upd_last & (wire.upd_node != N),
                     wire.upd_node, N)
    clock = clock.at[node].set(
        jnp.where(node != N, wire.upd_t, 0.0)).at[N].set(0.0)
    return StreamDeviceState(cache=cache, clock=clock)


def _insert_with_eid(state, src, dst, t, e_id):
    """ops/neighbor_cache.insert_events with EXPLICIT global event ids
    (the packer keys recency by the dataset row index so that
    ``feats[e_id]`` hits the msg table, reference epoch_utils.py:224);
    padded events carry e_id = -1 and lose every top-k tie."""
    import jax.numpy as jnp
    from ..ops import neighbor_cache as nc

    K = state.neighbors.shape[1]
    B = src.shape[0]
    M = 2 * B
    nodes = jnp.concatenate([dst, src]).astype(jnp.int32)
    nbrs = jnp.concatenate([src, dst]).astype(jnp.int32)
    eid = jnp.concatenate([e_id, e_id]).astype(jnp.int32)
    tt = jnp.concatenate([t, t]).astype(jnp.float32)
    half = jnp.concatenate([jnp.zeros((B,), jnp.int32),
                            jnp.ones((B,), jnp.int32)])
    pos_local = jnp.concatenate([jnp.arange(B), jnp.arange(B)]
                                ).astype(jnp.int32)
    subkey = pos_local * 2 + half
    perm1 = jnp.argsort(subkey, stable=True)
    perm2 = jnp.argsort(nodes[perm1], stable=True)
    order = perm1[perm2]
    s_nodes = nodes[order]
    s_nbrs = nbrs[order]
    s_eid = eid[order]
    s_t = tt[order]
    idx = jnp.arange(M, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool),
                                s_nodes[1:] != s_nodes[:-1]])
    is_end = jnp.concatenate([s_nodes[1:] != s_nodes[:-1],
                              jnp.ones((1,), bool)])
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, idx, -1))
    j = jnp.arange(K, dtype=jnp.int32)
    gpos = idx[:, None] - (K - 1 - j)[None, :]
    new_valid = (gpos >= run_start[:, None]) & is_end[:, None]
    gsafe = jnp.clip(gpos, 0, M - 1)
    new_nbrs = s_nbrs[gsafe]
    new_eid = jnp.where(new_valid & (s_eid[gsafe] >= 0),
                        s_eid[gsafe], -1)
    new_t = jnp.where(new_eid >= 0, s_t[gsafe], -1.0)
    old_nbrs = state.neighbors[s_nodes]
    old_eid = state.e_id[s_nodes]
    old_t = state.t[s_nodes]
    cat_nbrs = jnp.concatenate([old_nbrs, new_nbrs], axis=1)
    cat_eid = jnp.concatenate([old_eid, new_eid], axis=1)
    cat_t = jnp.concatenate([old_t, new_t], axis=1)
    top_eid, perm = jax.lax.top_k(cat_eid, K)
    top_nbrs = jnp.take_along_axis(cat_nbrs, perm, axis=1)
    top_t = jnp.take_along_axis(cat_t, perm, axis=1)
    write_idx = jnp.where(is_end, s_nodes, state.neighbors.shape[0])
    from ..ops.neighbor_cache import NeighborCacheState
    return NeighborCacheState(
        neighbors=state.neighbors.at[write_idx].set(top_nbrs, mode="drop"),
        e_id=state.e_id.at[write_idx].set(top_eid, mode="drop"),
        t=state.t.at[write_idx].set(top_t, mode="drop"),
        cur_e_id=state.cur_e_id,
    )
