"""Pallas TPU kernel: fused masked row attention (scalar-message mode).

The hot inner op of the flagship embedding (models/tgnn.py scalar mode,
re-designing reference EdgeGATConv + edge_softmax, model_utils.py:560-599):
for every root slot r and head h over its Kp in-edge columns

    logit[r,k,h] = leaky_relu(el'[r,k,h] + er[r,h])
    a            = masked softmax over k
    out[r,h]     = Σ_k a[r,k,h] · el'[r,k,h]

XLA implements this as separate mask/max/exp/sum/div/mul/sum HLOs, each
streaming the (R, Kp, H) logits through HBM; the fused kernel reads
el'/er/mask once and writes only (R, H).  Layout: the (R, Kp, H) tensor
is transposed to (R*H, Kp) so the reduction axis is the 128-lane axis
(H=8 as a trailing dim would waste 16× in lane padding).

Forward + hand-written backward (custom_vjp) so the kernel is usable
under `jax.grad`.  `attention_core(..., use_pallas=False)` is the jnp
reference implementation — the two are A/B-testable behind one call
(tests/test_pallas.py compares them, including gradients, in interpreter
mode on CPU).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


# ----------------------------------------------------------------- reference
def attention_core_reference(el_prime: jnp.ndarray, er: jnp.ndarray,
                             mask: jnp.ndarray, negative_slope: float,
                             drop_mask=None) -> jnp.ndarray:
    """jnp reference: el' (R, Kp, H), er (R, H), mask (R, Kp) -> (R, H).
    ``drop_mask`` is an optional PRE-SCALED (R, Kp, H) multiplier
    (1/keep or 0) applied between softmax and the weighted sum — the
    training default's attention dropout (models/tgnn.py)."""
    logits = jax.nn.leaky_relu(el_prime + er[:, None, :], negative_slope)
    logits = jnp.where(mask[..., None], logits, NEG_INF)
    a = jax.nn.softmax(logits, axis=1)
    a = jnp.where(mask[..., None], a, 0.0)
    if drop_mask is not None:
        a = a * drop_mask
    return jnp.sum(a * el_prime, axis=1)


# ------------------------------------------------------------------- kernels
def _fwd_kernel(e_ref, er_ref, m_ref, out_ref, a_ref, slope_ref):
    e = e_ref[:].astype(jnp.float32)          # (TR, Kp)
    er = er_ref[:].astype(jnp.float32)        # (TR, 1)
    m = m_ref[:]                              # (TR, Kp) int32 mask
    x = e + er
    logits = jnp.where(x >= 0, x, x * slope_ref[0, 0])
    logits = jnp.where(m > 0, logits, NEG_INF)
    mx = jnp.max(logits, axis=1, keepdims=True)
    ex = jnp.exp(logits - mx)
    ex = jnp.where(m > 0, ex, 0.0)
    den = jnp.maximum(jnp.sum(ex, axis=1, keepdims=True), 1e-30)
    a = ex / den
    a_ref[:] = a
    out_ref[:] = jnp.sum(a * e, axis=1, keepdims=True)


def _bwd_kernel(e_ref, er_ref, m_ref, a_ref, g_ref, de_ref, der_ref,
                slope_ref):
    e = e_ref[:].astype(jnp.float32)          # (TR, Kp)
    er = er_ref[:].astype(jnp.float32)        # (TR, 1)
    m = m_ref[:]
    a = a_ref[:]
    g = g_ref[:]                              # (TR, 1)
    # out = Σ_k a_k e_k ;  d a_k = g e_k ; d e_k (direct) = a_k g
    da = g * e
    # softmax backward: dl_k = a_k (da_k − Σ_j a_j da_j)
    s = jnp.sum(a * da, axis=1, keepdims=True)
    dl = a * (da - s)
    # leaky backward on x = e + er
    x = e + er
    dx = jnp.where(x >= 0, dl, dl * slope_ref[0, 0])
    dx = jnp.where(m > 0, dx, 0.0)
    de_ref[:] = dx + a * g
    der_ref[:] = jnp.sum(dx, axis=1, keepdims=True)


def _fwd_kernel_drop(e_ref, er_ref, m_ref, dm_ref, out_ref, a_ref,
                     slope_ref):
    """Forward with attention dropout folded in: dm is the PRE-SCALED
    f32 multiplier (1/keep or 0) — shipped as f32, not a sub-word mask
    (Mosaic on v5e rejects int8 vector compares), and applied AFTER the
    softmax like the XLA path (models/tgnn.py).  a_ref saves the
    PRE-DROPOUT probabilities (the softmax residual the backward
    needs)."""
    e = e_ref[:].astype(jnp.float32)          # (TR, Kp)
    er = er_ref[:].astype(jnp.float32)        # (TR, 1)
    m = m_ref[:]                              # (TR, Kp) int32 mask
    dm = dm_ref[:]                            # (TR, Kp) f32 scaled mask
    x = e + er
    logits = jnp.where(x >= 0, x, x * slope_ref[0, 0])
    logits = jnp.where(m > 0, logits, NEG_INF)
    mx = jnp.max(logits, axis=1, keepdims=True)
    ex = jnp.exp(logits - mx)
    ex = jnp.where(m > 0, ex, 0.0)
    den = jnp.maximum(jnp.sum(ex, axis=1, keepdims=True), 1e-30)
    a = ex / den
    a_ref[:] = a
    out_ref[:] = jnp.sum(a * dm * e, axis=1, keepdims=True)


def _bwd_kernel_drop(e_ref, er_ref, m_ref, dm_ref, a_ref, g_ref, de_ref,
                     der_ref, slope_ref):
    e = e_ref[:].astype(jnp.float32)
    er = er_ref[:].astype(jnp.float32)
    m = m_ref[:]
    dm = dm_ref[:]
    a = a_ref[:]                              # pre-dropout probs
    g = g_ref[:]                              # (TR, 1)
    # out = Σ_k a_k dm_k e_k ; d a_k = g dm_k e_k ;
    # d e_k (direct) = a_k dm_k g
    da = g * dm * e
    s = jnp.sum(a * da, axis=1, keepdims=True)
    dl = a * (da - s)
    x = e + er
    dx = jnp.where(x >= 0, dl, dl * slope_ref[0, 0])
    dx = jnp.where(m > 0, dx, 0.0)
    de_ref[:] = dx + a * dm * g
    der_ref[:] = jnp.sum(dx, axis=1, keepdims=True)


def _run_fwd(e2, er2, m2, slope, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    RH, Kp = e2.shape
    TR = min(512, RH)
    grid = (RH // TR,)
    spec_rk = pl.BlockSpec((TR, Kp), lambda i: (i, 0),
                           memory_space=pl.ANY if interpret
                           else pltpu.VMEM)
    spec_r1 = pl.BlockSpec((TR, 1), lambda i: (i, 0),
                           memory_space=pl.ANY if interpret
                           else pltpu.VMEM)
    spec_s = pl.BlockSpec((1, 1), lambda i: (0, 0),
                          memory_space=pl.ANY if interpret
                          else pltpu.SMEM)
    out, a = pl.pallas_call(
        lambda e, er, m, s, o, av: _fwd_kernel(e, er, m, o, av, s),
        out_shape=(jax.ShapeDtypeStruct((RH, 1), jnp.float32),
                   jax.ShapeDtypeStruct((RH, Kp), jnp.float32)),
        grid=grid,
        in_specs=[spec_rk, spec_r1, spec_rk, spec_s],
        out_specs=(spec_r1, spec_rk),
        interpret=interpret,
    )(e2, er2, m2, slope)
    return out, a


def _run_bwd(e2, er2, m2, a, g2, slope, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    RH, Kp = e2.shape
    TR = min(512, RH)
    grid = (RH // TR,)
    spec_rk = pl.BlockSpec((TR, Kp), lambda i: (i, 0),
                           memory_space=pl.ANY if interpret
                           else pltpu.VMEM)
    spec_r1 = pl.BlockSpec((TR, 1), lambda i: (i, 0),
                           memory_space=pl.ANY if interpret
                           else pltpu.VMEM)
    spec_s = pl.BlockSpec((1, 1), lambda i: (0, 0),
                          memory_space=pl.ANY if interpret
                          else pltpu.SMEM)
    de, der = pl.pallas_call(
        lambda e, er, m, av, g, s, o1, o2: _bwd_kernel(e, er, m, av, g,
                                                       o1, o2, s),
        out_shape=(jax.ShapeDtypeStruct((RH, Kp), jnp.float32),
                   jax.ShapeDtypeStruct((RH, 1), jnp.float32)),
        grid=grid,
        in_specs=[spec_rk, spec_r1, spec_rk, spec_rk, spec_r1, spec_s],
        out_specs=(spec_rk, spec_r1),
        interpret=interpret,
    )(e2, er2, m2, a, g2, slope)
    return de, der


def _run_fwd_drop(e2, er2, m2, dm2, slope, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    RH, Kp = e2.shape
    TR = min(512, RH)
    grid = (RH // TR,)
    spec_rk = pl.BlockSpec((TR, Kp), lambda i: (i, 0),
                           memory_space=pl.ANY if interpret
                           else pltpu.VMEM)
    spec_r1 = pl.BlockSpec((TR, 1), lambda i: (i, 0),
                           memory_space=pl.ANY if interpret
                           else pltpu.VMEM)
    spec_s = pl.BlockSpec((1, 1), lambda i: (0, 0),
                          memory_space=pl.ANY if interpret
                          else pltpu.SMEM)
    out, a = pl.pallas_call(
        lambda e, er, m, dm, s, o, av: _fwd_kernel_drop(e, er, m, dm, o,
                                                        av, s),
        out_shape=(jax.ShapeDtypeStruct((RH, 1), jnp.float32),
                   jax.ShapeDtypeStruct((RH, Kp), jnp.float32)),
        grid=grid,
        in_specs=[spec_rk, spec_r1, spec_rk, spec_rk, spec_s],
        out_specs=(spec_r1, spec_rk),
        interpret=interpret,
    )(e2, er2, m2, dm2, slope)
    return out, a


def _run_bwd_drop(e2, er2, m2, dm2, a, g2, slope, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    RH, Kp = e2.shape
    TR = min(512, RH)
    grid = (RH // TR,)
    spec_rk = pl.BlockSpec((TR, Kp), lambda i: (i, 0),
                           memory_space=pl.ANY if interpret
                           else pltpu.VMEM)
    spec_r1 = pl.BlockSpec((TR, 1), lambda i: (i, 0),
                           memory_space=pl.ANY if interpret
                           else pltpu.VMEM)
    spec_s = pl.BlockSpec((1, 1), lambda i: (0, 0),
                          memory_space=pl.ANY if interpret
                          else pltpu.SMEM)
    de, der = pl.pallas_call(
        lambda e, er, m, dm, av, g, s, o1, o2: _bwd_kernel_drop(
            e, er, m, dm, av, g, o1, o2, s),
        out_shape=(jax.ShapeDtypeStruct((RH, Kp), jnp.float32),
                   jax.ShapeDtypeStruct((RH, 1), jnp.float32)),
        grid=grid,
        in_specs=[spec_rk, spec_r1, spec_rk, spec_rk, spec_rk, spec_r1,
                  spec_s],
        out_specs=(spec_rk, spec_r1),
        interpret=interpret,
    )(e2, er2, m2, dm2, a, g2, slope)
    return de, der


def _pad_rows_to(x, mult):
    n = x.shape[0]
    m = -(-n // mult) * mult
    if m == n:
        return x, n
    pad = [(0, m - n)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad), n


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _attention_pallas(el_prime, er, mask, negative_slope, interpret):
    out, _ = _attention_pallas_fwd(el_prime, er, mask, negative_slope,
                                   interpret)
    return out


def _flatten(el_prime, er, mask):
    R, Kp, H = el_prime.shape
    e2 = jnp.transpose(el_prime, (0, 2, 1)).reshape(R * H, Kp)
    er2 = er.reshape(R * H, 1)
    # int32 mask: Mosaic on TPU rejects sub-word (int8) vector compares
    # ("Target does not support this comparison", v5e)
    m2 = jnp.broadcast_to(mask[:, None, :], (R, H, Kp)).reshape(
        R * H, Kp).astype(jnp.int32)
    return e2, er2, m2


def _attention_pallas_fwd(el_prime, er, mask, negative_slope, interpret):
    R, Kp, H = el_prime.shape
    e2, er2, m2 = _flatten(el_prime, er, mask)
    TR = 512
    e2p, n = _pad_rows_to(e2, TR)
    er2p, _ = _pad_rows_to(er2, TR)
    m2p, _ = _pad_rows_to(m2, TR)
    slope = jnp.full((1, 1), negative_slope, jnp.float32)
    out2, a2 = _run_fwd(e2p, er2p, m2p, slope, interpret)
    out = out2[:n, 0].reshape(R, H)
    return out, (e2p, er2p, m2p, a2, (R, Kp, H))


def _attention_pallas_bwd(negative_slope, interpret, res, g):
    e2p, er2p, m2p, a2, (R, Kp, H) = res
    g2 = g.reshape(R * H, 1).astype(jnp.float32)
    g2p, _ = _pad_rows_to(g2, 512)
    slope = jnp.full((1, 1), negative_slope, jnp.float32)
    de2, der2 = _run_bwd(e2p, er2p, m2p, a2, g2p, slope, interpret)
    n = R * H
    d_el = jnp.transpose(de2[:n].reshape(R, H, Kp), (0, 2, 1))
    d_er = der2[:n, 0].reshape(R, H)
    return d_el.astype(jnp.float32), d_er.astype(jnp.float32), None


_attention_pallas.defvjp(_attention_pallas_fwd, _attention_pallas_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _attention_pallas_drop(el_prime, er, mask, drop_mask, negative_slope,
                           interpret):
    out, _ = _attention_pallas_drop_fwd(el_prime, er, mask, drop_mask,
                                        negative_slope, interpret)
    return out


def _attention_pallas_drop_fwd(el_prime, er, mask, drop_mask,
                               negative_slope, interpret):
    R, Kp, H = el_prime.shape
    e2, er2, m2 = _flatten(el_prime, er, mask)
    dm2 = jnp.transpose(drop_mask, (0, 2, 1)).reshape(R * H, Kp) \
        .astype(jnp.float32)
    TR = 512
    e2p, n = _pad_rows_to(e2, TR)
    er2p, _ = _pad_rows_to(er2, TR)
    m2p, _ = _pad_rows_to(m2, TR)
    dm2p, _ = _pad_rows_to(dm2, TR)
    slope = jnp.full((1, 1), negative_slope, jnp.float32)
    out2, a2 = _run_fwd_drop(e2p, er2p, m2p, dm2p, slope, interpret)
    out = out2[:n, 0].reshape(R, H)
    return out, (e2p, er2p, m2p, dm2p, a2, (R, Kp, H))


def _attention_pallas_drop_bwd(negative_slope, interpret, res, g):
    e2p, er2p, m2p, dm2p, a2, (R, Kp, H) = res
    g2 = g.reshape(R * H, 1).astype(jnp.float32)
    g2p, _ = _pad_rows_to(g2, 512)
    slope = jnp.full((1, 1), negative_slope, jnp.float32)
    de2, der2 = _run_bwd_drop(e2p, er2p, m2p, dm2p, a2, g2p, slope,
                              interpret)
    n = R * H
    d_el = jnp.transpose(de2[:n].reshape(R, H, Kp), (0, 2, 1))
    d_er = der2[:n, 0].reshape(R, H)
    # the drop mask is an rng constant — no gradient flows into it
    d_dm = jnp.zeros((R, Kp, H), jnp.float32)
    return (d_el.astype(jnp.float32), d_er.astype(jnp.float32), None,
            d_dm)


_attention_pallas_drop.defvjp(_attention_pallas_drop_fwd,
                              _attention_pallas_drop_bwd)


def attention_core(el_prime: jnp.ndarray, er: jnp.ndarray,
                   mask: jnp.ndarray, negative_slope: float,
                   use_pallas: bool = False,
                   interpret: bool = False,
                   drop_mask=None) -> jnp.ndarray:
    """Masked row attention (R, Kp, H) -> (R, H); Pallas or XLA path.
    ``drop_mask``: optional pre-scaled (R, Kp, H) f32 dropout multiplier
    (1/keep or 0) folded into the fused kernel — covers the TRAINING
    default attn_drop > 0 the plain kernel could not serve (VERDICT r3
    item 9)."""
    if not use_pallas:
        return attention_core_reference(el_prime, er, mask,
                                        negative_slope, drop_mask)
    if drop_mask is None:
        return _attention_pallas(el_prime.astype(jnp.float32),
                                 er.astype(jnp.float32), mask,
                                 float(negative_slope), interpret)
    return _attention_pallas_drop(el_prime.astype(jnp.float32),
                                  er.astype(jnp.float32), mask,
                                  drop_mask, float(negative_slope),
                                  interpret)
