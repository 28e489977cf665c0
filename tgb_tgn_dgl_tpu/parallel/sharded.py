"""Sharded training step: dp × state partitioned TGNN train step.

Builds the same train step as engine/train.py but jitted over a Mesh with
explicit in/out shardings (parallel/mesh.py layout).  Gradient psum over
'dp' and cross-shard gathers for memory/feature rows are inserted by
GSPMD from the sharding annotations (SURVEY.md §5.8).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.packer import DevicePack, Pack
from ..models.tgnn import TGNNConfig, bce_loss, init_tgnn, tgnn_forward
from . import mesh as mesh_lib


def build_sharded_train_step(model_cfg: TGNNConfig, optimizer, mesh):
    """Returns (step_fn, placement) where placement shards the operands.

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
        """Device-put operands with the layout. Pads state rows to the
        'state' axis size and batch/root dims to the 'dp' size."""
        dp_n = mesh.shape["dp"]
        st_n = mesh.shape["state"]
        mem = _pad_rows(memory, st_n)
        ft = _pad_rows(feats, st_n)
        dev = pack.device()
        dev = DevicePack(*[_pad_leading(np.asarray(a), dp_n)
                           for a in dev])
        params = jax.device_put(params, rep)
        opt_state = jax.device_put(opt_state, rep)
        mem = jax.device_put(mem, state_sh)
        ft = jax.device_put(ft, state_sh)
        dev = jax.tree.map(lambda a, s: jax.device_put(a, s), dev, pack_sh)
        return params, opt_state, mem, ft, dev

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
