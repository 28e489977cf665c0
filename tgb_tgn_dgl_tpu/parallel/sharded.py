"""Sharded training step: dp × state partitioned flagship train step.

Builds the FULL flagship training step — wire expansion, mailbox-memory
apply/commit (models/memory.py), edge-attention embedding, BCE/Adam —
jitted over a Mesh with explicit in/out shardings (parallel/mesh.py
layout):

  * events / root slots / grids / write plans: range-partitioned over
    the "dp" axis (edge-stream data parallelism);
  * node state (memory, last_update, mailbox) and the edge-feature
    table: row-sharded over the "state" axis;
  * parameters and optimizer state: replicated; GSPMD derives the psum
    for gradients and the all-gather/all-to-all for cross-shard node-row
    gathers and scatter commits from these annotations (SURVEY.md §5.8).

The reference has no distributed mode at all (SURVEY.md §2.4) — this
subsystem is the framework's new first-class capability.  The legacy
frozen-memory variant is kept for A/B runs.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.packer import DevicePack, Pack
from ..models.memory import (MemoryModelConfig, MemoryState, apply_mail,
                             commit)
from ..models.tgnn import TGNNConfig, bce_loss, init_tgnn, tgnn_forward
from ..ops.wire import WirePack, expand_wire
from . import mesh as mesh_lib


def build_sharded_train_step(model_cfg: TGNNConfig, optimizer, mesh):
    """Legacy frozen-memory variant (memory = static table).

    step_fn(params, opt_state, memory, feats, pack, rng) ->
        (params, opt_state, loss, pos, neg)
    """
    pack_sh = mesh_lib.pack_shardings(mesh)
    state_sh = mesh_lib.state_sharding(mesh)
    rep = mesh_lib.replicated(mesh)

    def step(params, opt_state, memory, feats, pack, rng):
        def loss_fn(p):
            pos, neg = tgnn_forward(p, model_cfg, memory, feats, pack,
                                    train=True, rng=rng)
            return bce_loss(pos, neg, pack.ev_valid), (pos, neg)

        (loss, (pos, neg)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, pos, neg

    step_jit = jax.jit(
        step,
        in_shardings=(rep, rep, state_sh, state_sh, pack_sh, rep),
        out_shardings=(rep, rep, rep, None, None),
        donate_argnums=(0, 1),
    )

    def placement(params, opt_state, memory, feats, pack: Pack):
        dp_n = mesh.shape["dp"]
        st_n = mesh.shape["state"]
        mem = _pad_rows(memory, st_n)
        ft = _pad_rows(feats, st_n)
        dev = pack.device()
        dev = DevicePack(*[(None if a is None
                            else _pad_leading(np.asarray(a), dp_n))
                           for a in dev])
        params = jax.device_put(params, rep)
        opt_state = jax.device_put(opt_state, rep)
        mem = jax.device_put(mem, state_sh)
        ft = jax.device_put(ft, state_sh)
        dev = jax.tree.map(lambda a, s: jax.device_put(a, s), dev, pack_sh)
        return params, opt_state, mem, ft, dev

    return step_jit, placement


def build_sharded_memory_train_step(model_cfg: TGNNConfig,
                                    mem_cfg: MemoryModelConfig,
                                    optimizer, mesh,
                                    num_neighbors: int,
                                    intra_width: int):
    """The FULL flagship step (real mailbox memory, wire format), sharded.

    step_fn(params, opt_state, mem_state, feats, wire, rng) ->
        (params, opt_state, mem_state, loss, pos, neg)

    Layout: params/opt replicated (psum'd grads); MemoryState row-sharded
    over "state"; wire arrays dp-sharded.  The apply_mail gathers and the
    commit scatters cross the "state" axis — GSPMD lowers them to
    all-gather / scatter collectives over ICI.
    """
    wire_sh = mesh_lib.wire_shardings(mesh)
    state_sh = mesh_lib.state_sharding(mesh)
    row_sh = mesh_lib.row_sharding(mesh)
    rep = mesh_lib.replicated(mesh)
    mem_sh = MemoryState(
        mem=state_sh, last_update=row_sh,
        mail_src=state_sh, mail_dst=state_sh, mail_t=state_sh,
        mail_eid=state_sh, mail_valid=state_sh,
    )
    K = num_neighbors
    N = mem_cfg.num_nodes

    def step(params, opt_state, mem_state, feats, wire, rng):
        pack = expand_wire(wire, K, intra_width, N)

        def loss_fn(p):
            mem_rows, lu_rows = apply_mail(p["memory"], mem_cfg,
                                           mem_state, pack.uniq_nid, feats)
            pos, neg = tgnn_forward(p, model_cfg, mem_rows, feats, pack,
                                    train=True, rng=rng, local=True)
            return (bce_loss(pos, neg, pack.ev_valid),
                    (pos, neg, mem_rows, lu_rows))

        (loss, (pos, neg, mem_rows, lu_rows)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        new_state = commit(mem_cfg, mem_state, pack.uniq_nid, mem_rows,
                           lu_rows, pack.mw_node, pack.mw_slot,
                           pack.mw_partner, pack.mw_t, pack.mw_eid)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, new_state, loss, pos, neg

    step_jit = jax.jit(
        step,
        in_shardings=(rep, rep, mem_sh, state_sh, wire_sh, rep),
        out_shardings=(rep, rep, mem_sh, rep, None, None),
        donate_argnums=(0, 1, 2),
    )

    def placement(params, opt_state, mem_state: MemoryState, feats,
                  wire: WirePack):
        dp_n = mesh.shape["dp"]
        st_n = mesh.shape["state"]
        mem_state = MemoryState(*[
            jax.device_put(_pad_rows(a, st_n), s)
            for a, s in zip(mem_state, mem_sh)])
        ft = jax.device_put(_pad_rows(feats, st_n), state_sh)
        wire = WirePack(*[(None if a is None
                           else _pad_leading(np.asarray(a), dp_n))
                          for a in wire])
        wire = jax.tree.map(lambda a, s: jax.device_put(a, s), wire,
                            wire_sh)
        params = jax.device_put(params, rep)
        opt_state = jax.device_put(opt_state, rep)
        return params, opt_state, mem_state, ft, wire

    return step_jit, placement


def _pad_rows(a, k):
    a = np.asarray(a) if not isinstance(a, jax.Array) else a
    n = a.shape[0]
    m = mesh_lib.pad_rows_to(n, k)
    if m == n:
        return a
    pad = [(0, m - n)] + [(0, 0)] * (a.ndim - 1)
    return jnp.pad(a, pad) if isinstance(a, jax.Array) else np.pad(a, pad)


def _pad_leading(a: np.ndarray, k: int) -> np.ndarray:
    n = a.shape[0]
    m = mesh_lib.pad_rows_to(n, k)
    if m == n:
        return a
    pad = [(0, m - n)] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, pad)
