"""TGN node memory — functional mailbox design, TPU-native.

Re-designs the reference's two memory implementations as ONE functional
state machine:

  * the canonical PyG-path ``TGNMemory`` (reference
    modules/memory_module.py:25-215): per-node raw-message stores
    (python dicts of (src, dst, t, raw_msg) tuples, :85-86,140-145),
    lazy message computation with the *current* memory
    (`_compute_msg`, :193-207), Last/Mean aggregation
    (modules/msg_agg.py), GRU/RNN cell update (:71-78,172), and
    scatter-max last_update (:176);
  * the DGL-path ``MemoryModule``/``MemoryOperation`` (reference
    model_utils.py:240-416) whose message is cat(mem_src, mem_dst,
    efeat, Δt-enc) aggregated last-by-timestamp (:393-405).

The python-dict message store is unshardable and CPU-bound; here it
becomes a fixed-slot **mailbox** ``(N, S, ·)`` of raw-message *ids*
(src, dst, t, event-row) — the TGL ``mailbox_size`` knob of
config memory.mailbox_size (reference config/TGN.yml:15).  Messages are
computed lazily at apply time from the current memory (identical to the
PyG path's `_compute_msg`), so with S=1 + LastAggregator this is
mathematically the reference's last-message semantics (SURVEY.md §7.2).

Functional protocol per batch (train and eval share it):

  1. ``apply_mail``: for the batch's unique node set (event endpoints,
     negatives, cache neighbors — everything whose memory will be read),
     compute messages from mailbox slots, aggregate (last-by-event-id /
     mean), run the GRU/RNN cell, producing updated rows.  Gradients
     flow into the cell/time-encoder for this one step (the same
     one-step truncated BPTT the reference gets from per-batch
     ``memory.detach()``, modules/memory_module.py:112-114).
  2. the embedding module reads those rows;
  3. ``commit``: scatter updated rows back, clear applied mailbox slots,
     and write the batch's events as new mail via the host-computed
     write plan (unique (node, slot) pairs → deterministic scatter,
     unlike the dict store's last-write-wins races).

Timing note: the reference applies a node's pending mail at its next
*event* (train) or at batch end (eval) — `update_state` order differs
(modules/memory_module.py:126-138).  Here pending mail is applied at the
node's next *read*.  The applied values are identical (same stored
messages, same base memory); only the wall-clock moment of the state
write differs, and reads can never observe the difference because a
node's memory is only consumed at reads.

All state arrays carry one extra trash row (index N) so padded scatter
targets stay harmless; the trash row is re-zeroed after every commit.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.recurrent import CELLS
from ..ops.time_encode import init_time_encode, time_encode


class MemoryModelConfig(NamedTuple):
    num_nodes: int
    raw_msg_dim: int
    memory_dim: int = 100        # memory.dim_out
    time_dim: int = 100          # memory.dim_time
    mailbox_size: int = 1        # memory.mailbox_size (S)
    updater: str = "gru"         # memory.memory_update: 'gru' | 'rnn'
    combine: str = "last"        # memory.mail_combine: 'last' | 'mean'

    @property
    def msg_dim(self) -> int:
        """IdentityMessage layout: mem_src ⊕ mem_dst ⊕ raw ⊕ Δt-enc
        (reference modules/msg_func.py:12-18)."""
        return 2 * self.memory_dim + self.raw_msg_dim + self.time_dim


class MemoryState(NamedTuple):
    """Device pytree; every array has N+1 rows (row N = trash)."""

    mem: jnp.ndarray          # (N+1, D) float32
    last_update: jnp.ndarray  # (N+1,) float32
    mail_src: jnp.ndarray     # (N+1, S) int32 — keyed node
    mail_dst: jnp.ndarray     # (N+1, S) int32 — event partner
    mail_t: jnp.ndarray       # (N+1, S) float32
    mail_eid: jnp.ndarray     # (N+1, S) int32 — dataset msg-table row
    mail_valid: jnp.ndarray   # (N+1, S) bool


def init_memory_params(key, cfg: MemoryModelConfig) -> Dict:
    init_cell, _ = CELLS[cfg.updater]
    k_cell, = jax.random.split(key, 1)
    return {
        "time": init_time_encode(cfg.time_dim),
        "cell": init_cell(k_cell, cfg.msg_dim, cfg.memory_dim),
    }


def init_memory_state(cfg: MemoryModelConfig) -> MemoryState:
    """Zeros, like ``reset_memory``/PyG ``reset_state`` (reference
    model_utils.py:273-288, modules/memory_module.py:103-110)."""
    n1 = cfg.num_nodes + 1
    s = cfg.mailbox_size
    return MemoryState(
        mem=jnp.zeros((n1, cfg.memory_dim), jnp.float32),
        last_update=jnp.zeros((n1,), jnp.float32),
        mail_src=jnp.zeros((n1, s), jnp.int32),
        mail_dst=jnp.zeros((n1, s), jnp.int32),
        mail_t=jnp.zeros((n1, s), jnp.float32),
        mail_eid=jnp.zeros((n1, s), jnp.int32),
        mail_valid=jnp.zeros((n1, s), bool),
    )


def apply_mail(
    params: Dict,
    cfg: MemoryModelConfig,
    state: MemoryState,
    uniq_nid: jnp.ndarray,        # (U,) int32, padded entries = N (trash)
    feats_table: jnp.ndarray,     # (E, F) raw msg table
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compute updated memory rows for the unique node set.

    Returns (mem_rows (U, D), lu_rows (U,)) — rows WITH pending mail
    applied; rows without mail pass through unchanged.
    """
    _, cell = CELLS[cfg.updater]
    ms = state.mail_src[uniq_nid]        # (U, S)
    md = state.mail_dst[uniq_nid]
    mt = state.mail_t[uniq_nid]
    me = state.mail_eid[uniq_nid]
    mv = state.mail_valid[uniq_nid]
    lu = state.last_update[uniq_nid]     # (U,)
    h = state.mem[uniq_nid]              # (U, D)

    # IdentityMessage: mem[src] ⊕ mem[dst] ⊕ raw ⊕ enc(t − last_update[src])
    # (reference modules/msg_func.py:12-18, memory_module.py:193-207)
    dt = mt - lu[:, None]
    msg = jnp.concatenate([
        state.mem[ms],                                   # (U, S, D)
        state.mem[md],
        feats_table[jnp.clip(me, 0, feats_table.shape[0] - 1)],
        time_encode(params["time"], dt),
    ], axis=-1)

    if cfg.mailbox_size == 1:
        # S=1 (the TGL default, config/TGN.yml:15): one slot IS the
        # last/mean message — skip the argmax/take-along selection
        # machinery (each op is a kernel; kernel count is the binding
        # cost on tunneled runtimes, BASELINE.md round-5 census)
        agg = msg[:, 0]
    elif cfg.combine == "last":
        # last-by-event-id (the global event counter is strictly
        # time-ordered, the same recency key the reference's cache topk
        # uses, neighbor_loader.py:99; LastAggregator uses scatter_max
        # on t, msg_agg.py:15-21 — eid is its deterministic tiebreak)
        score = jnp.where(mv, me, -1)
        sel = jnp.argmax(score, axis=1)                  # (U,)
        agg = jnp.take_along_axis(msg, sel[:, None, None], axis=1)[:, 0]
    elif cfg.combine == "mean":
        w = mv.astype(msg.dtype)
        denom = jnp.maximum(w.sum(axis=1, keepdims=True), 1.0)
        agg = (msg * w[..., None]).sum(axis=1) / denom
    else:
        raise ValueError(f"unknown mail_combine '{cfg.combine}'")

    upd = cell(params["cell"], agg, h)                   # (U, D)
    has = mv.any(axis=1)
    mem_rows = jnp.where(has[:, None], upd, h)
    lu_rows = jnp.where(has, jnp.where(mv, mt, -jnp.inf).max(axis=1), lu)
    return mem_rows, lu_rows


def commit(
    cfg: MemoryModelConfig,
    state: MemoryState,
    uniq_nid: jnp.ndarray,     # (U,) padded with N
    mem_rows: jnp.ndarray,     # (U, D) from apply_mail
    lu_rows: jnp.ndarray,      # (U,)
    mw_node: jnp.ndarray,      # (W,) int32 write plan, invalid = N
    mw_slot: jnp.ndarray,      # (W,) int32 ring slot (host-assigned)
    mw_partner: jnp.ndarray,   # (W,) int32
    mw_t: jnp.ndarray,         # (W,) float32
    mw_eid: jnp.ndarray,       # (W,) int32
) -> MemoryState:
    """Scatter updated rows, clear applied slots, write new mail.

    All (node) targets in uniq_nid and all (node, slot) pairs in the
    write plan are unique by host construction, except the trash row N
    (duplicates there are harmless and re-zeroed)."""
    n = cfg.num_nodes
    mem = state.mem.at[uniq_nid].set(mem_rows).at[n].set(0.0)
    lu = state.last_update.at[uniq_nid].set(lu_rows).at[n].set(0.0)
    valid = state.mail_valid.at[uniq_nid].set(False)
    valid = valid.at[mw_node, mw_slot].set(True).at[n].set(False)
    msrc = state.mail_src.at[mw_node, mw_slot].set(mw_node).at[n].set(0)
    mdst = state.mail_dst.at[mw_node, mw_slot].set(mw_partner).at[n].set(0)
    mt = state.mail_t.at[mw_node, mw_slot].set(mw_t).at[n].set(0.0)
    meid = state.mail_eid.at[mw_node, mw_slot].set(mw_eid).at[n].set(0)
    return MemoryState(mem=mem, last_update=lu, mail_src=msrc,
                       mail_dst=mdst, mail_t=mt, mail_eid=meid,
                       mail_valid=valid)
