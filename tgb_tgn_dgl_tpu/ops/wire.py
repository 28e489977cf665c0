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


def expand_wire(wire: WirePack, num_neighbors: int, intra_width: int,
                num_nodes: int) -> DevicePack:
    """Device-side reconstruction of the full DevicePack (pure jnp; runs
    inside the jitted step).  Bit-equivalent to Pack.device() — verified
    by tests/test_wire.py."""
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
