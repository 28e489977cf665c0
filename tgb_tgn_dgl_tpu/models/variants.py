"""Memory-model variants: DyRep and JODIE.

Capability parity with the reference's variant family:

  * ``DyRepMemory`` (reference modules/memory_module.py:218-421): TGN
    memory where the message uses the *embedding* of the event partner
    instead of (or concatenated with) raw memory
    (`use_src_emb_in_msg` / `use_dst_emb_in_msg`, :266-267,387-408), and
    the update cell is an RNN for JODIE/DyRep (:259-264).
  * ``TimeEmbedding`` (reference modules/emb_module.py:32-52): JODIE's
    time-projection embedding z = mem · (1 + Linear(Δt)) with the JODIE
    normal(0, 1/√d) init.

Because messages that reference embeddings cannot be recomputed lazily
(the embedding of the partner at event time is a transient), the DyRep
variant stores EAGER mail values: the mailbox holds the computed message
vector per slot instead of (src, dst, t, eid) ids.  Aggregation and the
cell update are shared with models/memory.py semantics.
"""
from __future__ import annotations

import math
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.recurrent import CELLS
from ..ops.time_encode import init_time_encode, time_encode


class EagerMemoryConfig(NamedTuple):
    num_nodes: int
    mail_dim: int                 # stored message width
    memory_dim: int = 100
    updater: str = "rnn"          # DyRep/JODIE default (reference :259-264)
    combine: str = "last"
    # Message-field composition (reference modules/memory_module.py:266-267,
    # 387-408): the stored message is cat(self_field, partner_field, raw,
    # Δt-enc); each field is the node's MEMORY by default and its batch
    # EMBEDDING when toggled.  Reference defaults: both False.
    use_src_emb: bool = False     # self field   ← use_src_emb_in_msg
    use_dst_emb: bool = False     # partner field ← use_dst_emb_in_msg


class EagerMemoryState(NamedTuple):
    """(N+1)-row state; mailbox stores computed mail vectors."""

    mem: jnp.ndarray          # (N+1, D)
    last_update: jnp.ndarray  # (N+1,)
    mail: jnp.ndarray         # (N+1, S, mail_dim)
    mail_t: jnp.ndarray       # (N+1, S)
    mail_eid: jnp.ndarray     # (N+1, S)
    mail_valid: jnp.ndarray   # (N+1, S)


def init_eager_memory_params(key, cfg: EagerMemoryConfig) -> Dict:
    init_cell, _ = CELLS[cfg.updater]
    return {"cell": init_cell(key, cfg.mail_dim, cfg.memory_dim)}


def init_eager_memory_state(cfg: EagerMemoryConfig,
                            mailbox_size: int = 1) -> EagerMemoryState:
    n1 = cfg.num_nodes + 1
    return EagerMemoryState(
        mem=jnp.zeros((n1, cfg.memory_dim), jnp.float32),
        last_update=jnp.zeros((n1,), jnp.float32),
        mail=jnp.zeros((n1, mailbox_size, cfg.mail_dim), jnp.float32),
        mail_t=jnp.zeros((n1, mailbox_size), jnp.float32),
        mail_eid=jnp.zeros((n1, mailbox_size), jnp.int32),
        mail_valid=jnp.zeros((n1, mailbox_size), bool),
    )


def eager_apply_mail(params: Dict, cfg: EagerMemoryConfig,
                     state: EagerMemoryState,
                     uniq_nid: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(mem_rows (U, D), lu_rows (U,)) with pending mail applied."""
    _, cell = CELLS[cfg.updater]
    mail = state.mail[uniq_nid]          # (U, S, F)
    mt = state.mail_t[uniq_nid]
    me = state.mail_eid[uniq_nid]
    mv = state.mail_valid[uniq_nid]
    h = state.mem[uniq_nid]
    lu = state.last_update[uniq_nid]
    if mail.shape[1] == 1:
        # one slot IS the last/mean message (see models/memory.py) —
        # selected-away values only feed the has-masked cell update
        agg = mail[:, 0]
    elif cfg.combine == "last":
        score = jnp.where(mv, me, -1)
        sel = jnp.argmax(score, axis=1)
        agg = jnp.take_along_axis(mail, sel[:, None, None], axis=1)[:, 0]
    else:
        w = mv.astype(mail.dtype)
        denom = jnp.maximum(w.sum(axis=1, keepdims=True), 1.0)
        agg = (mail * w[..., None]).sum(axis=1) / denom
    upd = cell(params["cell"], agg, h)
    has = mv.any(axis=1)
    mem_rows = jnp.where(has[:, None], upd, h)
    lu_rows = jnp.where(has, jnp.where(mv, mt, -jnp.inf).max(axis=1), lu)
    return mem_rows, lu_rows


def eager_commit(cfg: EagerMemoryConfig, state: EagerMemoryState,
                 uniq_nid, mem_rows, lu_rows,
                 mw_node, mw_slot, mw_mail, mw_t, mw_eid) -> EagerMemoryState:
    """mw_mail: (W, mail_dim) computed message values (e.g. DyRep's
    cat(partner_embedding, raw, Δt-enc)); (node, slot) pairs unique."""
    n = cfg.num_nodes
    mem = state.mem.at[uniq_nid].set(mem_rows).at[n].set(0.0)
    lu = state.last_update.at[uniq_nid].set(lu_rows).at[n].set(0.0)
    valid = state.mail_valid.at[uniq_nid].set(False)
    valid = valid.at[mw_node, mw_slot].set(True).at[n].set(False)
    mail = state.mail.at[mw_node, mw_slot].set(
        jax.lax.stop_gradient(mw_mail)).at[n].set(0.0)
    mt = state.mail_t.at[mw_node, mw_slot].set(mw_t).at[n].set(0.0)
    meid = state.mail_eid.at[mw_node, mw_slot].set(mw_eid).at[n].set(0)
    return EagerMemoryState(mem=mem, last_update=lu, mail=mail, mail_t=mt,
                            mail_eid=meid, mail_valid=valid)


def dyrep_messages(cfg: EagerMemoryConfig, embed: jnp.ndarray, pack,
                   feats_table: jnp.ndarray, time_params: Dict,
                   mem_rows: jnp.ndarray,
                   lu_rows: jnp.ndarray) -> jnp.ndarray:
    """Build eager mail for the write plan: for each write (node ← event),
    mail = cat(self_field, partner_field, raw_msg, Δt-enc) — the
    reference's IdentityMessage layout (modules/msg_func.py:12-18) with
    the DyRep toggles (modules/memory_module.py:266-267,387-408): each
    field is the node's post-apply memory, or this batch's computed
    embedding when cfg.use_src_emb (self) / cfg.use_dst_emb (partner).
    Eager deviation (documented in the module docstring): the reference
    recomputes messages lazily at the NEXT batch touching the node, using
    whatever embeddings that batch happens to produce; here the message is
    evaluated once at event time, where both endpoints are roots by
    construction.

    pack must be the expanded DevicePack; embed the (R, D) root-slot
    embeddings; mem_rows/lu_rows the (U, D)/(U,) post-apply local memory
    table from eager_apply_mail (indexed via pack.root_loc — both write
    endpoints are event endpoints, hence roots).  Δt = t − last_update of
    the SELF node (reference :386-387).  Returns (W, mail_dim)."""
    # write w = 2i   (node=src:  self slot ev_src_slot[i], partner ev_pos)
    #       w = 2i+1 (node=dst:  self slot ev_pos_slot[i], partner ev_src)
    B = pack.ev_src.shape[0]
    ev = jnp.arange(2 * B) // 2
    is_src_write = (jnp.arange(2 * B) % 2) == 0
    self_slot = jnp.where(is_src_write, pack.ev_src_slot[ev],
                          pack.ev_pos_slot[ev])
    partner_slot = jnp.where(is_src_write, pack.ev_pos_slot[ev],
                             pack.ev_src_slot[ev])
    f_self = (embed[self_slot] if cfg.use_src_emb
              else mem_rows[pack.root_loc[self_slot]])      # (W, D)
    f_partner = (embed[partner_slot] if cfg.use_dst_emb
                 else mem_rows[pack.root_loc[partner_slot]])
    raw = feats_table[jnp.clip(pack.mw_eid, 0,
                               feats_table.shape[0] - 1)]   # (W, F)
    dt = pack.mw_t - lu_rows[pack.root_loc[self_slot]]
    te = time_encode(time_params, dt)
    return jnp.concatenate([f_self, f_partner, raw, te], axis=-1)


# ------------------------------------------------------------------ JODIE
def init_time_embedding(key, dim: int) -> Dict:
    """JODIE time projection init: normal(0, 1/√d) weights
    (reference modules/emb_module.py:38-46)."""
    k1, k2 = jax.random.split(key)
    std = 1.0 / math.sqrt(dim)
    return {
        "w": std * jax.random.normal(k1, (1, dim)),
        "b": jnp.zeros((dim,)),
    }


def time_embedding(params: Dict, mem_rows: jnp.ndarray,
                   dt: jnp.ndarray) -> jnp.ndarray:
    """z = mem · (1 + Linear(Δt)) (reference modules/emb_module.py:48-52)."""
    proj = dt[..., None] * params["w"][0] + params["b"]
    return mem_rows * (1.0 + proj)
