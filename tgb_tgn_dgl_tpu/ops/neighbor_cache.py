"""Functional recency neighbor cache (device-resident, jit-able).

Capability parity with the reference ``LastNeighborLoader``
(reference neighbor_loader.py:15-109): a fixed-size (N, K) most-recent-
neighbor ring buffer per node, queried as a dense grid and updated by a
merge-and-topk on event id.  Differences by design (SURVEY.md §7.2):

* State is a pure pytree threaded through jit steps (donated buffers give
  in-place XLA updates) instead of mutable torch buffers.
* ``query`` returns the dense (M, K) grid with an ``e_id >= 0`` validity
  mask instead of ragged filtering (neighbor_loader.py:41-42); relabeling
  to a batch-local id space (the ``_assoc`` trick, neighbor_loader.py:47-48)
  is a host/packer concern and not needed on the dense path.
* ``insert`` resolves the reference's undefined behavior for >K events of
  one node per batch (torch scatter collision, neighbor_loader.py:75-88)
  deterministically: entries are ordered by (node, e_id, direction) and the
  last K win — identical to the reference wherever the reference is
  well-defined (top-K by e_id recency, neighbor_loader.py:99).

This component exists for online/streaming serving and parity tests; the
offline training path precomputes the same grids on the host
(``data/packer.py``), which is strictly faster because cache evolution is
a pure function of the event stream.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class NeighborCacheState(NamedTuple):
    neighbors: jnp.ndarray  # (N, K) int32 — global neighbor node ids
    e_id: jnp.ndarray       # (N, K) int32 — event id, -1 = empty slot
    t: jnp.ndarray          # (N, K) float32 — event time, -1 = empty
    cur_e_id: jnp.ndarray   # () int32 — next event id


def init_neighbor_cache(num_nodes: int, size: int) -> NeighborCacheState:
    """reset_state semantics: e_id/t filled with -1
    (reference neighbor_loader.py:106-109)."""
    return NeighborCacheState(
        neighbors=jnp.zeros((num_nodes, size), dtype=jnp.int32),
        e_id=jnp.full((num_nodes, size), -1, dtype=jnp.int32),
        t=jnp.full((num_nodes, size), -1.0, dtype=jnp.float32),
        cur_e_id=jnp.zeros((), dtype=jnp.int32),
    )


def reset_neighbor_cache(state: NeighborCacheState) -> NeighborCacheState:
    return NeighborCacheState(
        neighbors=state.neighbors,
        e_id=jnp.full_like(state.e_id, -1),
        t=jnp.full_like(state.t, -1.0),
        cur_e_id=jnp.zeros_like(state.cur_e_id),
    )


def query_neighbors(
    state: NeighborCacheState, n_id: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dense 1-hop query: (M,) node ids -> (neighbors, e_id, t, mask),
    each (M, K).  Mask replaces the e_id>=0 filter of the reference
    (neighbor_loader.py:41-42)."""
    nbrs = state.neighbors[n_id]
    eid = state.e_id[n_id]
    t = state.t[n_id]
    return nbrs, eid, t, eid >= 0


def insert_events(
    state: NeighborCacheState,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    t: jnp.ndarray,
) -> NeighborCacheState:
    """Insert a batch of events into the undirected recency cache.

    Vectorized re-expression of reference neighbor_loader.py:52-104: each
    event (u, v, t) contributes entry v->cache[u] and u->cache[v]; per node
    the union of cached and new entries is reduced to the K largest e_ids.
    Static shapes throughout: O(B*K) work, no uniques.
    """
    K = state.neighbors.shape[1]
    B = src.shape[0]
    M = 2 * B
    src = src.astype(jnp.int32)
    dst = dst.astype(jnp.int32)

    # Entry i owns cache row `nodes[i]` and records neighbor `nbrs[i]`.
    # Reference order: neighbors=[src,dst], nodes=[dst,src]
    # (neighbor_loader.py:57-58).
    nodes = jnp.concatenate([dst, src])
    nbrs = jnp.concatenate([src, dst])
    eid_local = jnp.concatenate([jnp.arange(B), jnp.arange(B)]).astype(jnp.int32)
    eid = state.cur_e_id + eid_local
    tt = jnp.concatenate([t, t]).astype(jnp.float32)
    half = jnp.concatenate(
        [jnp.zeros((B,), jnp.int32), jnp.ones((B,), jnp.int32)]
    )

    # Sort by (node, e_id, direction): two-pass stable argsort (lexsort)
    # — avoids an int64 composite key, which would overflow int32 when
    # x64 is disabled and N * 4B exceeds 2^31.
    subkey = eid_local * 2 + half
    perm1 = jnp.argsort(subkey, stable=True)
    perm2 = jnp.argsort(nodes[perm1], stable=True)
    order = perm1[perm2]
    s_nodes = nodes[order]
    s_nbrs = nbrs[order]
    s_eid = eid[order]
    s_t = tt[order]

    idx = jnp.arange(M, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), s_nodes[1:] != s_nodes[:-1]]
    )
    is_end = jnp.concatenate(
        [s_nodes[1:] != s_nodes[:-1], jnp.ones((1,), bool)]
    )
    # Index of each position's run start / end via max/min prefix scans.
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, idx, -1)
    )
    run_end = jax.lax.associative_scan(
        jnp.minimum, jnp.where(is_end, idx, M), reverse=True
    )
    run_len = run_end - run_start + 1

    # For each run-end position, gather that node's last-K new entries.
    # offsets j in [0, K): position p - (K - 1 - j); valid when within run.
    j = jnp.arange(K, dtype=jnp.int32)
    gpos = idx[:, None] - (K - 1 - j)[None, :]              # (M, K)
    new_valid = (gpos >= run_start[:, None]) & is_end[:, None]
    gsafe = jnp.clip(gpos, 0, M - 1)
    new_nbrs = s_nbrs[gsafe]
    new_eid = jnp.where(new_valid, s_eid[gsafe], -1)
    new_t = jnp.where(new_valid, s_t[gsafe], -1.0)

    # Merge with existing rows and keep top-K by e_id
    # (reference neighbor_loader.py:91-104).
    old_nbrs = state.neighbors[s_nodes]
    old_eid = state.e_id[s_nodes]
    old_t = state.t[s_nodes]
    cat_nbrs = jnp.concatenate([old_nbrs, new_nbrs], axis=1)     # (M, 2K)
    cat_eid = jnp.concatenate([old_eid, new_eid], axis=1)
    cat_t = jnp.concatenate([old_t, new_t], axis=1)
    top_eid, perm = jax.lax.top_k(cat_eid, K)
    top_nbrs = jnp.take_along_axis(cat_nbrs, perm, axis=1)
    top_t = jnp.take_along_axis(cat_t, perm, axis=1)

    # Scatter back only at run ends; other entries are dropped.
    write_idx = jnp.where(is_end, s_nodes, state.neighbors.shape[0])
    new_state = NeighborCacheState(
        neighbors=state.neighbors.at[write_idx].set(top_nbrs, mode="drop"),
        e_id=state.e_id.at[write_idx].set(top_eid, mode="drop"),
        t=state.t.at[write_idx].set(top_t, mode="drop"),
        cur_e_id=state.cur_e_id + B,
    )
    return new_state
