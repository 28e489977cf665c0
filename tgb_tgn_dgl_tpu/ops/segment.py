"""Segment reductions for sparse temporal-graph aggregation.

TPU-native replacements for the reference's foreign scatter kernels
(SURVEY.md §2.3): torch_scatter ``scatter_max`` (reference
modules/msg_agg.py:12,17), PyG ``scatter`` (modules/memory_module.py:176),
and DGL's ``edge_softmax``/``update_all`` segment pipeline
(model_utils.py:594-599).  All ops take a static ``num_segments`` so XLA
compiles once; invalid entries are handled with masks instead of ragged
filtering.

These XLA versions are the correctness substrate; the Pallas variants in
``ops/pallas_kernels.py`` are drop-in replacements behind the same
signatures (A/B-able, SURVEY.md §7.2).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -1e30


def segment_sum(data, segment_ids, num_segments):
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_max(data, segment_ids, num_segments):
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments)


def segment_mean(data, segment_ids, num_segments, mask=None):
    """Mean-reduce rows by segment (reference MeanAggregator,
    modules/msg_agg.py:24-26). Empty segments produce zeros."""
    if mask is not None:
        data = jnp.where(mask[..., None] if data.ndim > 1 else mask, data, 0)
        ones = mask.astype(data.dtype)
    else:
        ones = jnp.ones(data.shape[:1], data.dtype)
    s = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    c = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)
    return s / jnp.maximum(c, 1)[..., None] if data.ndim > 1 else s / jnp.maximum(c, 1)


def segment_argmax(key, segment_ids, num_segments, mask=None, tie="last"):
    """Per-segment argmax of ``key`` with deterministic tie-breaking.

    Replaces torch_scatter ``scatter_max``'s argmax output (reference
    modules/msg_agg.py:17) with a defined tie rule: ``tie='last'`` keeps the
    highest index (insertion recency, matching the reference's e_id-recency
    convention, neighbor_loader.py:99), ``tie='first'`` the lowest.
    Returns (values, argmax); empty segments get value -inf and argmax = n
    (out of range; mask with ``counts > 0``).
    """
    n = key.shape[0]
    idx = jnp.arange(n)
    key = key.astype(jnp.float32)
    if mask is not None:
        key = jnp.where(mask, key, _NEG)
    # Pack (key, index) into a single sortable float? Safer: two-pass.
    seg_max = jax.ops.segment_max(key, segment_ids, num_segments=num_segments)
    is_max = key >= seg_max[segment_ids] - 0.0
    if mask is not None:
        is_max = jnp.logical_and(is_max, mask)
    if tie == "last":
        cand = jnp.where(is_max, idx, -1)
        arg = jax.ops.segment_max(cand, segment_ids, num_segments=num_segments)
        arg = jnp.where(arg < 0, n, arg)
    else:
        cand = jnp.where(is_max, idx, n)
        arg = jax.ops.segment_min(cand, segment_ids, num_segments=num_segments)
    return seg_max, arg


def segment_last(msg, segment_ids, t, num_segments, mask=None):
    """Last-message aggregation: for each segment keep the row of ``msg``
    with the largest ``t`` (ties -> highest index).  Reference
    LastAggregator (modules/msg_agg.py:15-21); empty segments -> zeros
    (reference: ``out`` is new_zeros and only filled where a message
    exists)."""
    _, arg = segment_argmax(t, segment_ids, num_segments, mask=mask, tie="last")
    valid = arg < msg.shape[0]
    safe = jnp.minimum(arg, msg.shape[0] - 1)
    out = msg[safe]
    return jnp.where(valid[:, None], out, 0)


def segment_softmax(logits, segment_ids, num_segments, mask=None):
    """Numerically-stable softmax over edges grouped by destination
    segment — the TPU-native replacement for DGL's C++ ``edge_softmax``
    (reference model_utils.py:597).  ``logits`` is (E,) or (E, H);
    masked-out edges get weight 0.
    """
    orig_dtype = logits.dtype
    x = logits.astype(jnp.float32)
    if mask is not None:
        m = mask if x.ndim == 1 else mask[:, None]
        x = jnp.where(m, x, _NEG)
    seg_max = jax.ops.segment_max(x, segment_ids, num_segments=num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    x = jnp.exp(x - seg_max[segment_ids])
    if mask is not None:
        m = mask if x.ndim == 1 else mask[:, None]
        x = jnp.where(m, x, 0.0)
    denom = jax.ops.segment_sum(x, segment_ids, num_segments=num_segments)
    out = x / jnp.maximum(denom[segment_ids], 1e-16)
    return out.astype(orig_dtype)


def masked_softmax(logits, mask, axis=-1):
    """Dense row softmax with validity mask — the workhorse of the packed
    dense attention path (replaces edge_softmax when edges are laid out as
    a fixed (rows, K) grid; SURVEY.md §7.2 'static shapes everywhere')."""
    orig_dtype = logits.dtype
    x = jnp.where(mask, logits.astype(jnp.float32), _NEG)
    x = x - jax.lax.stop_gradient(jnp.max(x, axis=axis, keepdims=True))
    ex = jnp.where(mask, jnp.exp(x), 0.0)
    denom = jnp.maximum(jnp.sum(ex, axis=axis, keepdims=True), 1e-16)
    return (ex / denom).astype(orig_dtype)
