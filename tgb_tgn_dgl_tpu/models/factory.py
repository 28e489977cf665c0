"""Model factory — arch dispatch for the TGL ``gnn.arch`` knob.

Capability parity with the reference's model families (SURVEY.md §7.1
item 4), selected by config:

  arch 'transformer_attention'  — flagship TGNN edge-attention embedding
                                  (models/tgnn.py); memory optional
                                  (frozen-ones quirk or real mailbox).
  arch 'identity'               — JODIE: embedding = time-projected
                                  memory rows (models/variants.py
                                  TimeEmbedding; reference
                                  modules/emb_module.py:32-52), RNN
                                  memory; requires memory.
  arch 'dyrep'                  — DyRep: attention embedding + EAGER
                                  mail whose messages contain the event
                                  partner's *embedding* (reference
                                  modules/memory_module.py:218-421),
                                  RNN memory; requires memory.

Each builder returns the params pytree additions and pure forward
helpers; the engine composes them with the shared memory apply/commit
protocol.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .tgnn import TGNNConfig, edge_predictor, init_tgnn, tgnn_embed
from .variants import init_time_embedding, time_embedding

ARCHS = ("transformer_attention", "identity", "dyrep")


def init_arch_params(key, arch: str, model_cfg: TGNNConfig) -> Dict:
    if arch in ("transformer_attention", "dyrep"):
        return init_tgnn(key, model_cfg)
    if arch == "identity":
        k1, k2, k3, k4 = jax.random.split(key, 4)
        from .init import linear_default
        D = model_cfg.hidden_dim
        return {
            "jodie": init_time_embedding(k1, D),
            "pred": {
                "src_fc": linear_default(k2, D, D),
                "dst_fc": linear_default(k3, D, D),
                "out_fc": linear_default(k4, 1, D),
            },
        }
    raise ValueError(f"unknown gnn.arch '{arch}' (supported: {ARCHS})")


def arch_embed(params: Dict, arch: str, model_cfg: TGNNConfig,
               memory_rows: jnp.ndarray, lu_rows, feats_table, pack, *,
               train: bool, rng=None, local: bool) -> jnp.ndarray:
    """Per-root-slot embeddings (R, D) for any arch.

    memory_rows: (U, D) local rows when local=True, else a full (N, D)
    table.  lu_rows: (U,) last-update times (None for non-memory runs)."""
    if arch in ("transformer_attention", "dyrep"):
        return tgnn_embed(params, model_cfg, memory_rows, feats_table,
                          pack, train=train, rng=rng, local=local)
    if arch == "identity":
        assert local and lu_rows is not None, "JODIE requires memory"
        # the self-loop column carries dt = -clock[root] (packer), so the
        # root's current event time is -dt; recover it from the DevicePack
        # column whose kind is SELF
        from ..data.packer import KIND_SELF
        is_self = pack.nbr_kind == KIND_SELF            # (R, Kp)
        clock_root = -(pack.nbr_dt * is_self).sum(axis=1)
        mem_root = memory_rows[pack.root_loc]           # (R, D)
        dt = clock_root - lu_rows[pack.root_loc]
        z = time_embedding(params["jodie"], mem_root, dt)
        return jnp.where(pack.root_valid[:, None], z, 0.0)
    raise ValueError(f"unknown gnn.arch '{arch}'")


def arch_predict(params: Dict, embed: jnp.ndarray, pack):
    """(pos, neg) logits from root-slot embeddings — shared 2-tower
    scorer (reference model_utils.py:165-195)."""
    h_src = embed[pack.ev_src_slot]
    h_pos = embed[pack.ev_pos_slot]
    h_neg = embed[pack.ev_neg_slot]
    return edge_predictor(params["pred"], h_src, h_pos, h_neg)
