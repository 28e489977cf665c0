"""TGNN — the flagship model (reference's active DGL path), TPU-native.

Re-design of reference model_utils.py:14-159 (TGNN), :201-237 (TimeEncode),
:422-455 (TemporalEdgePreprocess), :471-612 (EdgeGATConv), :615-697
(TemporalTransformerConv), :165-195 (EdgePredictor).

Architecture translation (SURVEY.md §7.2): the reference's per-batch loop —
sequential dependency sub-blocks, ``dgl.in_subgraph`` extraction, in-loop
``g.add_edges`` graph growth — is replaced by ONE dense pass over the
host-packed grid (data/packer.py): every (node, block) root slot carries a
fixed-width row of in-edges (K cache + 1 self-loop + P intra-batch) with
Δt pre-resolved, so attention is a masked row softmax over an (R, Kp)
grid.  Causality is preserved by construction of the grid, not by
sequential execution: block-i positive edges appear only in rows of blocks
> i.  No dynamic shapes, no scatter into a growing graph, no Python loop
under jit.

Faithful quirks preserved (flags to change them):
  * message_mode='scalar': the reference's EdgeGAT messages are per-head
    SCALARS — msg = a * el_prime with el_prime of shape (E, H, 1)
    (model_utils.py:560-563,587-599) — broadcast-added to the identity
    residual and averaged over heads.  The fused form here never
    materializes (E, H*D) projections: fc_node/fc_edge collapse with
    attn_l/attn_r/attn_e into (D_in → H) projections, which is exact
    because dropout is applied to the *inputs*.  'vector' gives the
    corrected per-head vector-message attention.
  * The memory is frozen at all-ones (model_utils.py:270-271; update path
    commented out :139-146) — train.frozen_memory=False swaps in the real
    mailbox memory (models/memory.py).
  * Known reference bug NOT replicated: at eval the reference pairs
    ``h_src.tile(M, 1)`` (neg-major order) with event-major negative
    embeddings (model_utils.py:159,192 vs epoch_utils.py:100), scrambling
    (src, neg) pairs across events when M > 1.  We pair each source with
    its own negatives.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..data.packer import KIND_INTRA, KIND_CACHE, KIND_INVALID, KIND_SELF
from ..ops.segment import masked_softmax
from ..ops.time_encode import init_time_encode
from .init import (apply_linear, derive_key, dropout, linear_default,
                   linear_xavier, xavier_normal)


class TGNNConfig(NamedTuple):
    edge_feat_dim: int
    hidden_dim: int = 100          # gnn.dim_out; also time_dim & memory_dim
    num_heads: int = 8             # gnn.att_head
    num_layers: int = 1            # gnn.layer
    message_mode: str = "scalar"   # 'scalar' (reference quirk) | 'vector'
    feat_drop: float = 0.2         # train.dropout (reference hardcodes 0.6)
    attn_drop: float = 0.2         # train.att_dropout
    negative_slope: float = 0.2    # leaky_relu (model_utils.py:517)
    compute_dtype: Any = jnp.float32
    # Fused Pallas attention kernel (ops/pallas_attention.py) for the
    # scalar-mode softmax/weighted-sum; applies when attention dropout is
    # inactive (eval, or attn_drop == 0) — dropout sits between softmax
    # and the sum, which the fused kernel folds together.
    use_pallas: bool = False
    pallas_interpret: bool = False
    # The engine sets this on the reference-parity frozen-memory path
    # (memory ≡ ones, model_utils.py:270-271): node features become
    # literal ones with NO table gather.  Bit-exact vs gathering the
    # all-ones table, and removes the two hottest gathers of the step
    # (nbr_nid relabel + (R, Kp, D) memory gather — profiler, BASELINE.md).
    const_ones_memory: bool = False


def init_tgnn(key, cfg: TGNNConfig) -> Dict:
    """Build the learnable pytree.  time_dim = hidden_dim (the reference
    overrides its time_dim argument, model_utils.py:18).

    num_layers > 1 stacks EdgeGATConv layers over the SAME per-block
    in-edge structure — the reference's (commented) multi-layer path,
    model_utils.py:669-686: every conv runs over the sub-block's
    ``in_subgraph``, so a layer-l source contributes its layer-(l-1)
    output iff it is a root of the same block, else its input passes
    through the zero-in-degree identity residual (:567-577,541-546).
    Intermediate layers aggregate heads by MEAN (like the final layer;
    the commented code's ``flatten(1)`` H·D concat would break the
    fixed-width grid collapse — documented deviation on dead code).
    Extra layers live under keys 'gat2', 'gat3', …; all have identical
    shapes since memory_dim == hidden_dim."""
    if cfg.num_layers < 1:
        raise ValueError("gnn.layer must be >= 1")
    D = cfg.hidden_dim
    H = cfg.num_heads
    De = cfg.edge_feat_dim + D       # edge feat ⊕ time encoding

    def gat_params(k):
        ks = jax.random.split(k, 5)
        return {
            "fc_node": linear_xavier(ks[0], H * D, D),
            "fc_edge": linear_xavier(ks[1], H * D, De),
            "attn_l": xavier_normal(ks[2], (1, H, D))[0],
            "attn_r": xavier_normal(ks[3], (1, H, D))[0],
            "attn_e": xavier_normal(ks[4], (1, H, D))[0],
        }

    keys = jax.random.split(key, 4 + cfg.num_layers)
    params = {
        "time": init_time_encode(D),
        "gat": gat_params(keys[0]),
        "pred": {
            "src_fc": linear_default(keys[1], D, D),
            "dst_fc": linear_default(keys[2], D, D),
            "out_fc": linear_default(keys[3], 1, D),
        },
    }
    for l in range(2, cfg.num_layers + 1):
        params[f"gat{l}"] = gat_params(keys[2 + l])
    # residual: Identity when node_feats == out_feats (model_utils.py:541-546)
    # — always true here since memory_dim == hidden_dim.
    return params


def _fused_attn_proj(lin: Dict, attn: jnp.ndarray):
    """Collapse fc(x).view(-1,H,D) ⊙ attn → sum(-1) into x @ W_eff + b_eff.

    fc weight is stored (in, H*D); attn is (H, D).  Exact because the
    reference applies dropout to fc *inputs* (model_utils.py:579-589)."""
    in_dim = lin["w"].shape[0]
    H, D = attn.shape
    w = lin["w"].reshape(in_dim, H, D)
    w_eff = jnp.einsum("ihd,hd->ih", w, attn)
    b_eff = jnp.einsum("hd,hd->h", lin["b"].reshape(H, D), attn)
    return w_eff, b_eff


def tgnn_embed(
    params: Dict,
    cfg: TGNNConfig,
    memory: jnp.ndarray,           # (N, D) node memory (frozen: ones),
                                   # or (U, D) local rows when local=True
    feats_table: jnp.ndarray,      # (E_total, F) dataset msg table
    pack,                          # device Pack (see data/packer.py)
    *,
    train: bool,
    rng: Optional[jax.Array] = None,
    local: bool = False,           # memory is the batch-local (U, D) table
                                   # from models/memory.apply_mail; gather
                                   # via pack.nbr_loc/root_loc
) -> jnp.ndarray:
    """Embed every root slot: returns (R, D) embeddings.

    One dense fused pass = TemporalEdgePreprocess (Δt encode ⊕ edge feat,
    model_utils.py:440-449) + EdgeGATConv (attention logits el+ee+er,
    leaky-relu, per-root softmax, weighted sum, residual, head mean,
    model_utils.py:565-612,688-697) across ALL dependency blocks at once.
    """
    D = cfg.hidden_dim
    H = cfg.num_heads
    cdt = cfg.compute_dtype
    if rng is None:
        rng = jax.random.PRNGKey(0)
    det = not train

    kind = pack.nbr_kind                       # (R, Kp) int8
    mask = kind != KIND_INVALID                # (R, Kp)

    # ---- edge features: msg-table gather; self-loops are ones ----------
    # cast the TABLE before gathering: the (R, Kp, F) gather output is the
    # dominant HBM traffic of the step; in bf16 it is half the bytes
    feat_idx = jnp.clip(pack.nbr_feat, 0, feats_table.shape[0] - 1)
    ef = feats_table.astype(cdt)[feat_idx]     # (R, Kp, F)
    is_self = (kind == KIND_SELF)[..., None]
    ef = jnp.where(is_self, jnp.ones_like(ef), ef)
    ef = jnp.where(mask[..., None], ef, 0.0)

    # ---- Δt time encoding (TemporalEdgePreprocess) ----------------------
    te = jnp.cos(pack.nbr_dt[..., None] * params["time"]["w"]
                 + params["time"]["b"]).astype(cdt)   # (R, Kp, D)
    # NOTE: the edge input is conceptually concat(ef, te) (R, Kp, F+D) —
    # reference model_utils.py:440-449 — but the concat is never
    # materialized: every consumer splits its edge projection into
    # W[:F] @ ef + W[F:] @ te, which removes 3-4 (R, Kp, F+D) buffer
    # materializations per step (the dominant HBM traffic).  Dropout on
    # the edge input draws two masks (one per part) instead of one.
    F = ef.shape[-1]

    # ---- node features (memory rows; table cast before gather) ---------
    mem_c = memory.astype(cdt)
    R, Kp = kind.shape
    if local:
        nf_src = mem_c[pack.nbr_loc]                # (R, Kp, D)
        nf_dst = mem_c[pack.root_loc]               # (R, D)
    elif cfg.const_ones_memory:
        # frozen all-ones memory: skip the gathers entirely (exact)
        nf_src = jnp.ones((R, Kp, D), cdt)
        nf_dst = jnp.ones((R, D), cdt)
    else:
        nf_src = mem_c[pack.nbr_nid]                # (R, Kp, D)
        nf_dst = mem_c[pack.root_nid]               # (R, D)
    def gat_layer(gat, src_in, dst_in, ef_d, te_d, k_attn):
        """One EdgeGATConv pass over the grid -> (R, D) head-mean +
        identity residual (model_utils.py:565-612,688-697).  The edge
        input arrives split (ef_d, te_d); projections split to match."""
        if cfg.message_mode == "scalar":
            wl, bl = _fused_attn_proj(gat["fc_node"], gat["attn_l"])
            wr, br = _fused_attn_proj(gat["fc_node"], gat["attn_r"])
            we, be = _fused_attn_proj(gat["fc_edge"], gat["attn_e"])
            el = src_in @ wl.astype(cdt) + bl.astype(cdt)   # (R, Kp, H)
            er = dst_in @ wr.astype(cdt) + br.astype(cdt)   # (R, H)
            ee = (ef_d @ we[:F].astype(cdt)
                  + te_d @ we[F:].astype(cdt) + be.astype(cdt))
            el_prime = el + ee
            if cfg.use_pallas:
                from ..ops.pallas_attention import attention_core

                # training default attn_drop > 0: draw the SAME flat
                # bernoulli mask models/init.dropout would (bit-parity
                # with the XLA path) and fold it into the fused kernel
                # as a pre-scaled f32 multiplier (VERDICT r3 item 9)
                dm = None
                if not det and cfg.attn_drop > 0.0:
                    keep = 1.0 - cfg.attn_drop
                    bm = jax.random.bernoulli(
                        k_attn, keep, (el_prime.size,)).reshape(
                        el_prime.shape)
                    dm = jnp.where(bm, jnp.float32(1.0 / keep),
                                   jnp.float32(0.0))
                out = attention_core(el_prime, er, mask,
                                     cfg.negative_slope, use_pallas=True,
                                     interpret=cfg.pallas_interpret,
                                     drop_mask=dm)
            else:
                logits = jax.nn.leaky_relu(el_prime + er[:, None, :],
                                           cfg.negative_slope)
                a = masked_softmax(logits, mask[..., None], axis=1)
                a = dropout(k_attn, a, cfg.attn_drop, det)
                out = jnp.sum(a * el_prime, axis=1)          # (R, H)
            # identity residual + head mean: mean_h(out_h + dst_in_d)
            return dst_in + jnp.mean(out.astype(cdt), axis=-1,
                                     keepdims=True)
        # corrected vector-message attention
        node_p = apply_linear(gat["fc_node"], src_in).reshape(
            *src_in.shape[:-1], H, D)                        # (R, Kp, H, D)
        root_p = apply_linear(gat["fc_node"], dst_in).reshape(-1, H, D)
        wfe = gat["fc_edge"]["w"]
        edge_p = (ef_d @ wfe[:F] + te_d @ wfe[F:]
                  + gat["fc_edge"]["b"]).reshape(
            *ef_d.shape[:-1], H, D)
        el = jnp.sum(node_p * gat["attn_l"], -1)             # (R, Kp, H)
        er = jnp.sum(root_p * gat["attn_r"], -1)             # (R, H)
        ee = jnp.sum(edge_p * gat["attn_e"], -1)
        logits = jax.nn.leaky_relu(el + ee + er[:, None, :],
                                   cfg.negative_slope)
        a = masked_softmax(logits, mask[..., None], axis=1)
        a = dropout(k_attn, a, cfg.attn_drop, det)
        msg = a[..., None] * (node_p + edge_p)               # (R, Kp, H, D)
        out = jnp.sum(msg, axis=1)                           # (R, H, D)
        return jnp.mean(out + dst_in[:, None, :], axis=1)

    L = cfg.num_layers
    # derive_key distinctness contract: local offsets 8·l + q (q ≤ 5)
    # must stay under the engine's per-step key stride of 64, or masks
    # would silently repeat across steps (models/init.derive_key).
    assert L <= 8, f"gnn.layer={L} exceeds the dropout-key offset budget"
    rslot = getattr(pack, "nbr_rslot", None)
    if L > 1 and rslot is None:
        raise ValueError("gnn.layer > 1 needs nbr_rslot in the pack "
                         "(set PackerConfig.layers accordingly)")
    embed = None
    for l in range(L):
        # per-layer dropout keys by cheap additive derivation (one u32
        # add each — see models/init.derive_key); local offsets stay
        # below the engine's per-step stride of 64
        o = 8 * l
        k_nf = derive_key(rng, o + 1)
        k_nf2 = derive_key(rng, o + 2)
        k_ef = derive_key(rng, o + 3)
        k_ef2 = derive_key(rng, o + 4)
        k_attn = derive_key(rng, o + 5)
        if l == 0:
            src_in, dst_in = nf_src, nf_dst
            gat = params["gat"]
        else:
            # layer l source features: layer-(l-1) output where the
            # source is a root of the SAME block, else pass-through raw
            # features (zero-in-degree identity residual)
            safe = jnp.maximum(rslot, 0)
            src_in = jnp.where((rslot >= 0)[..., None], embed[safe],
                               nf_src)
            dst_in = embed
            gat = params[f"gat{l + 1}"]
        src_d = dropout(k_nf, src_in, cfg.feat_drop, det)
        dst_d = dropout(k_nf2, dst_in, cfg.feat_drop, det)
        ef_d = dropout(k_ef, ef, cfg.feat_drop, det)
        te_d = dropout(k_ef2, te, cfg.feat_drop, det)
        embed = gat_layer(gat, src_d, dst_d, ef_d, te_d, k_attn)
    return embed.astype(jnp.float32)


def edge_predictor(params: Dict, h_src, h_pos, h_neg):
    """GraphMixer-style 2-tower scorer (reference model_utils.py:165-195):
    out_fc(relu(src_fc(h_s) + dst_fc(h_d))).  h_neg may be (B, D) or
    (B, M, D); each source pairs with its own negatives (reference tile
    bug not replicated — see module docstring)."""
    s = apply_linear(params["src_fc"], h_src)
    p = apply_linear(params["dst_fc"], h_pos)
    n = apply_linear(params["dst_fc"], h_neg)
    pos = apply_linear(params["out_fc"], jax.nn.relu(s + p))[..., 0]
    if n.ndim == 3:
        s = s[:, None, :]
    neg = apply_linear(params["out_fc"], jax.nn.relu(s + n))[..., 0]
    return pos, neg


def tgnn_forward(
    params: Dict,
    cfg: TGNNConfig,
    memory: jnp.ndarray,
    feats_table: jnp.ndarray,
    pack,
    *,
    train: bool,
    rng: Optional[jax.Array] = None,
    local: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full forward: (pos_logits (B,), neg_logits (B,) or (B, M))."""
    embed = tgnn_embed(params, cfg, memory, feats_table, pack,
                       train=train, rng=rng, local=local)
    h_src = embed[pack.ev_src_slot]
    h_pos = embed[pack.ev_pos_slot]
    h_neg = embed[pack.ev_neg_slot]
    return edge_predictor(params["pred"], h_src, h_pos, h_neg)


def bce_loss(pos_logits, neg_logits, ev_valid):
    """BCEWithLogits mean over pos + mean over neg (reference
    epoch_utils.py:295-296), masked to real (non-padded) events."""
    v = ev_valid.astype(jnp.float32)
    pos_l = jnp.maximum(pos_logits, 0) - pos_logits + \
        jnp.log1p(jnp.exp(-jnp.abs(pos_logits)))
    neg_l = jnp.maximum(neg_logits, 0) + \
        jnp.log1p(jnp.exp(-jnp.abs(neg_logits)))
    denom = jnp.maximum(v.sum(), 1.0)
    pos_term = (pos_l * v).sum() / denom
    if neg_logits.ndim == 2:
        m = neg_logits.shape[1]
        neg_term = (neg_l * v[:, None]).sum() / jnp.maximum(v.sum() * m, 1.0)
    else:
        neg_term = (neg_l * v).sum() / denom
    return pos_term + neg_term
