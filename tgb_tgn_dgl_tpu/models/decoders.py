"""Decoder heads — capability parity with reference modules/decoder.py.

  * ``LinkPredictor`` (reference modules/decoder.py:12-27): 2-tower MLP —
    h = relu(lin_src(z_src) + lin_dst(z_dst)); score = lin_final(h).
    (The DGL path's GraphMixer-style EdgePredictor lives in tgnn.py.)
  * ``NodePredictor`` (reference modules/decoder.py:30-41): per-node
    classification head lin2(relu(lin1(z))).
  * ``ConvTransE`` (reference modules/decoder.py:45-123): the temporal-
    knowledge-graph decoder used by RE-GCN/CEN-style models — stack
    (subject, relation) embeddings as a 2-channel 1-D image, Conv1d over
    the embedding axis, project back to embedding space, and score
    against every entity embedding by inner product.

All are plain dense MXU work.  BatchNorm running statistics are carried
functionally (params, state) -> (out, new_state).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .init import apply_linear, dropout, linear_default


# --------------------------------------------------------------- link pred
def init_link_predictor(key, in_dim: int, hidden: Optional[int] = None) -> Dict:
    hidden = hidden or in_dim
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "lin_src": linear_default(k1, hidden, in_dim),
        "lin_dst": linear_default(k2, hidden, in_dim),
        "lin_final": linear_default(k3, 1, hidden),
    }


def link_predictor(params: Dict, z_src: jnp.ndarray,
                   z_dst: jnp.ndarray) -> jnp.ndarray:
    """Returns logits of shape z_src.shape[:-1]; broadcast over extra
    leading dims of z_dst (e.g. (B, M, D) negatives vs (B, D) sources)."""
    s = apply_linear(params["lin_src"], z_src)
    d = apply_linear(params["lin_dst"], z_dst)
    if d.ndim == s.ndim + 1:
        s = s[..., None, :]
    h = jax.nn.relu(s + d)
    return apply_linear(params["lin_final"], h)[..., 0]


# --------------------------------------------------------------- node pred
def init_node_predictor(key, in_dim: int, num_classes: int,
                        hidden: Optional[int] = None) -> Dict:
    hidden = hidden or in_dim
    k1, k2 = jax.random.split(key)
    return {
        "lin1": linear_default(k1, hidden, in_dim),
        "lin2": linear_default(k2, num_classes, hidden),
    }


def node_predictor(params: Dict, z: jnp.ndarray) -> jnp.ndarray:
    return apply_linear(params["lin2"],
                        jax.nn.relu(apply_linear(params["lin1"], z)))


# --------------------------------------------------------------- ConvTransE
class BNState(NamedTuple):
    mean: jnp.ndarray
    var: jnp.ndarray


def _init_bn(dim: int) -> Tuple[Dict, BNState]:
    return ({"scale": jnp.ones(dim), "bias": jnp.zeros(dim)},
            BNState(mean=jnp.zeros(dim), var=jnp.ones(dim)))


def _batch_norm(p: Dict, st: BNState, x: jnp.ndarray, axes, train: bool,
                momentum: float = 0.1, eps: float = 1e-5):
    """BatchNorm over `axes`; channel dim is the last non-reduced axis."""
    if train:
        mean = x.mean(axes)
        var = x.var(axes)
        new = BNState(mean=(1 - momentum) * st.mean + momentum * mean,
                      var=(1 - momentum) * st.var + momentum * var)
    else:
        mean, var = st.mean, st.var
        new = st
    shape = [1] * x.ndim
    ch_axis = [a for a in range(x.ndim) if a not in axes]
    shape[ch_axis[-1]] = -1
    xn = (x - mean.reshape(shape)) / jnp.sqrt(var.reshape(shape) + eps)
    return xn * p["scale"].reshape(shape) + p["bias"].reshape(shape), new


class ConvTransEState(NamedTuple):
    bn0: BNState
    bn1: BNState
    bn2: BNState


def init_conv_transe(key, embed_dim: int, channels: int = 50,
                     kernel_size: int = 3) -> Tuple[Dict, ConvTransEState]:
    k1, k2 = jax.random.split(key)
    bound = 1.0 / (2 * kernel_size) ** 0.5
    conv_w = jax.random.uniform(k1, (channels, 2, kernel_size),
                                jnp.float32, -bound, bound)
    conv_b = jnp.zeros(channels)
    p0, s0 = _init_bn(2)
    p1, s1 = _init_bn(channels)
    p2, s2 = _init_bn(embed_dim)
    params = {
        "conv_w": conv_w, "conv_b": conv_b,
        "bn0": p0, "bn1": p1, "bn2": p2,
        "fc": linear_default(k2, embed_dim, channels * embed_dim),
    }
    return params, ConvTransEState(bn0=s0, bn1=s1, bn2=s2)


def conv_transe(
    params: Dict,
    state: ConvTransEState,
    ent_table: jnp.ndarray,   # (N, D) all entity embeddings
    sub_emb: jnp.ndarray,     # (B, D) subject embeddings
    rel_emb: jnp.ndarray,     # (B, D) relation embeddings
    *,
    train: bool,
    rng: Optional[jax.Array] = None,
    input_drop: float = 0.2,
    hidden_drop: float = 0.2,
    feature_drop: float = 0.2,
) -> Tuple[jnp.ndarray, ConvTransEState]:
    """Score (B, N): every entity as object for each (sub, rel) query."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    k0, k1, k2 = jax.random.split(rng, 3)
    det = not train
    x = jnp.stack([sub_emb, rel_emb], axis=1)           # (B, 2, D)
    x, bn0 = _batch_norm(params["bn0"], state.bn0, x, (0, 2), train)
    x = dropout(k0, x, input_drop, det)
    # Conv1d over the embedding axis, SAME padding (torch: padding=ks//2)
    x = jax.lax.conv_general_dilated(
        x, params["conv_w"],
        window_strides=(1,),
        padding=[(params["conv_w"].shape[-1] // 2,) * 2],
        dimension_numbers=("NCH", "OIH", "NCH"),
    ) + params["conv_b"][None, :, None]                 # (B, C, D)
    x, bn1 = _batch_norm(params["bn1"], state.bn1, x, (0, 2), train)
    x = jax.nn.relu(x)
    x = dropout(k1, x, feature_drop, det)
    x = x.reshape(x.shape[0], -1)                       # (B, C*D)
    x = apply_linear(params["fc"], x)                   # (B, D)
    x = dropout(k2, x, hidden_drop, det)
    x, bn2 = _batch_norm(params["bn2"], state.bn2, x, (0,), train)
    x = jax.nn.relu(x)
    scores = x @ ent_table.T                            # (B, N)
    return scores, ConvTransEState(bn0=bn0, bn1=bn1, bn2=bn2)
