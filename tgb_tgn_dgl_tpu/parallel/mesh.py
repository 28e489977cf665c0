"""Device mesh + sharding layout for multi-chip training.

The reference is strictly single-process/single-GPU (SURVEY.md §2.4); this
subsystem is the framework's new first-class capability.  Mesh axes:

  "dp"    — edge-stream data parallelism: events and root slots of a batch
            are range-partitioned across chips (the temporal analogue of
            sequence parallelism, SURVEY.md §5.7).
  "state" — node-state sharding: memory rows / msg-table rows are sharded
            by row so big graphs' state scales with the slice.

GSPMD derives the collectives (all_gather for cross-shard root-slot
gathers, psum for gradients) from these annotations; the hand-scheduled
shard_map/all_to_all path can replace hot spots later without changing
the layout contract.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.packer import DevicePack

AXES = ("dp", "state")


def make_mesh(n_devices: Optional[int] = None,
              dp: Optional[int] = None,
              state: Optional[int] = None) -> Mesh:
    devices = np.asarray(jax.devices())
    n = n_devices or len(devices)
    devices = devices[:n]
    if dp is None and state is None:
        # favor dp; use a 2-way state axis when we have ≥4 chips
        state = 2 if n % 2 == 0 and n >= 4 else 1
        dp = n // state
    elif dp is None:
        dp = n // state
    elif state is None:
        state = n // dp
    assert dp * state == n, f"dp({dp}) * state({state}) != devices({n})"
    return Mesh(devices.reshape(dp, state), AXES)


def pack_shardings(mesh: Mesh) -> DevicePack:
    """NamedShardings for each DevicePack field: batch/root leading dims
    range-partitioned over 'dp'."""
    dp = lambda: NamedSharding(mesh, P("dp"))
    return DevicePack(
        ev_src=dp(), ev_dst=dp(), ev_t=dp(), ev_idx=dp(), ev_valid=dp(),
        ev_neg=dp(), root_nid=dp(), root_valid=dp(),
        nbr_nid=dp(), nbr_dt=dp(), nbr_kind=dp(), nbr_feat=dp(),
        ev_src_slot=dp(), ev_pos_slot=dp(), ev_neg_slot=dp(),
        uniq_nid=dp(), root_loc=dp(), nbr_loc=dp(),
        mw_node=dp(), mw_slot=dp(), mw_partner=dp(), mw_t=dp(),
        mw_eid=dp(),
    )


def state_sharding(mesh: Mesh) -> NamedSharding:
    """Row sharding for (N, ...) node state and (E, F) feature tables
    (only the leading axis is partitioned)."""
    return NamedSharding(mesh, P("state"))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for 1-D per-node vectors (e.g. last_update)."""
    return NamedSharding(mesh, P("state"))


def wire_shardings(mesh: Mesh, layers: int = 1):
    """NamedShardings for each WirePack field: batch/root/COO leading
    dims range-partitioned over 'dp'.  The multi-layer rslot fields are
    present (dp-sharded like their grids) only when layers > 1 — a
    layer-1 wire carries None there and the pytrees must match."""
    from ..ops.wire import WirePack

    dp = NamedSharding(mesh, P("dp"))
    sh = {f: dp for f in WirePack._fields}
    if layers == 1:
        sh["cache_rslot"] = None
        sh["ia_rslot"] = None
    return WirePack(**sh)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_rows_to(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k
