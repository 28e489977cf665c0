"""Pallas fused attention kernel vs the jnp reference — forward and
gradients, interpreter mode (runs on the CPU test mesh)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tgb_tgn_dgl_tpu.ops.pallas_attention import (attention_core,
                                                  attention_core_reference)


def _inputs(R=64, Kp=43, H=8, seed=0):
    rng = np.random.default_rng(seed)
    el = jnp.asarray(rng.normal(size=(R, Kp, H)), jnp.float32)
    er = jnp.asarray(rng.normal(size=(R, H)), jnp.float32)
    mask = jnp.asarray(rng.random((R, Kp)) < 0.7)
    # ensure at least one valid column per row (the packer guarantees the
    # self-loop column for real roots; fully-masked rows are pad rows)
    mask = mask.at[:, 0].set(True)
    return el, er, mask


def test_forward_matches_reference():
    el, er, mask = _inputs()
    want = attention_core_reference(el, er, mask, 0.2)
    got = attention_core(el, er, mask, 0.2, use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_reference():
    el, er, mask = _inputs(R=32, Kp=17, H=4, seed=1)

    def loss_ref(el, er):
        return (attention_core_reference(el, er, mask, 0.2) ** 2).sum()

    def loss_pal(el, er):
        return (attention_core(el, er, mask, 0.2, use_pallas=True,
                               interpret=True) ** 2).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(el, er)
    g_pal = jax.grad(loss_pal, argnums=(0, 1))(el, er)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_fully_masked_pad_rows_are_finite():
    el, er, mask = _inputs(R=16, Kp=8, H=2, seed=2)
    mask = mask.at[3].set(False)      # a pad row: every column invalid
    out = attention_core(el, er, mask, 0.2, use_pallas=True,
                         interpret=True)
    assert np.isfinite(np.asarray(out)).all()


def test_model_scalar_mode_with_pallas_flag():
    """tgnn_embed(message_mode='scalar') must produce identical outputs
    with use_pallas on/off (interpret mode)."""
    from tgb_tgn_dgl_tpu.data.dataset import synthetic
    from tgb_tgn_dgl_tpu.data.dependency import get_block
    from tgb_tgn_dgl_tpu.data.packer import PackerConfig, StreamPacker
    from tgb_tgn_dgl_tpu.models.tgnn import (TGNNConfig, init_tgnn,
                                             tgnn_embed)

    data = synthetic("tgbl-wiki-small", num_edges=300, num_nodes=50,
                     msg_dim=4, num_neg=2)
    packer = StreamPacker(data.num_nodes, PackerConfig(
        num_neighbors=4, batch_size=150))
    rng = np.random.default_rng(0)
    pack = None
    for lo in (0, 150):
        rows = np.arange(lo, lo + 150)
        src, dst, t = data.src[rows], data.dst[rows], data.t[rows]
        neg = rng.choice(data.unique_dst(), 150).astype(np.int32)
        pack = packer.pack(src, dst, t, rows, get_block(src, dst), neg)
    cfg = TGNNConfig(edge_feat_dim=4, hidden_dim=8, num_heads=2)
    params = init_tgnn(jax.random.PRNGKey(0), cfg)
    mem = jnp.ones((data.num_nodes, 8))
    feats = jnp.asarray(data.msg)
    base = tgnn_embed(params, cfg, mem, feats, pack.device(), train=False)
    cfg_p = cfg._replace(use_pallas=True, pallas_interpret=True)
    pal = tgnn_embed(params, cfg_p, mem, feats, pack.device(), train=False)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(base),
                               rtol=1e-4, atol=1e-5)


def test_dropout_folded_forward_and_grads():
    """The dropout-folded kernel (training default attn_drop > 0) must
    match the reference with the SAME pre-scaled mask — forward and
    gradients (VERDICT r3 item 9)."""
    el, er, mask = _inputs(R=32, Kp=17, H=4, seed=3)
    rng = np.random.default_rng(7)
    keep = 0.8
    dm = jnp.asarray(
        (rng.random((32, 17, 4)) < keep) / keep, jnp.float32)

    want = attention_core_reference(el, er, mask, 0.2, drop_mask=dm)
    got = attention_core(el, er, mask, 0.2, use_pallas=True,
                         interpret=True, drop_mask=dm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    def loss_ref(el, er):
        return (attention_core_reference(el, er, mask, 0.2,
                                         drop_mask=dm) ** 2).sum()

    def loss_pal(el, er):
        return (attention_core(el, er, mask, 0.2, use_pallas=True,
                               interpret=True, drop_mask=dm) ** 2).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(el, er)
    g_pal = jax.grad(loss_pal, argnums=(0, 1))(el, er)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_model_training_dropout_with_pallas_flag():
    """tgnn_embed in TRAIN mode with attn_drop > 0 produces identical
    activations with use_pallas on/off under the same step key — the
    kernel now covers the training default (it used to silently fall
    back to the XLA path whenever dropout was active)."""
    from tgb_tgn_dgl_tpu.data.dataset import synthetic
    from tgb_tgn_dgl_tpu.data.dependency import get_block
    from tgb_tgn_dgl_tpu.data.packer import PackerConfig, StreamPacker
    from tgb_tgn_dgl_tpu.models.tgnn import (TGNNConfig, init_tgnn,
                                             tgnn_embed)

    data = synthetic("tgbl-wiki-small", num_edges=300, num_nodes=50,
                     msg_dim=4, num_neg=2)
    packer = StreamPacker(data.num_nodes, PackerConfig(
        num_neighbors=4, batch_size=150))
    rng = np.random.default_rng(0)
    pack = None
    for lo in (0, 150):
        rows = np.arange(lo, lo + 150)
        src, dst, t = data.src[rows], data.dst[rows], data.t[rows]
        neg = rng.choice(data.unique_dst(), 150).astype(np.int32)
        pack = packer.pack(src, dst, t, rows, get_block(src, dst), neg)
    cfg = TGNNConfig(edge_feat_dim=4, hidden_dim=8, num_heads=2,
                     feat_drop=0.0, attn_drop=0.3)
    params = init_tgnn(jax.random.PRNGKey(0), cfg)
    mem = jnp.ones((data.num_nodes, 8))
    feats = jnp.asarray(data.msg)
    key = jax.random.PRNGKey(5)
    base = tgnn_embed(params, cfg, mem, feats, pack.device(), train=True,
                      rng=key)
    cfg_p = cfg._replace(use_pallas=True, pallas_interpret=True)
    pal = tgnn_embed(params, cfg_p, mem, feats, pack.device(),
                     train=True, rng=key)
    assert not np.allclose(np.asarray(base),
                           np.asarray(tgnn_embed(params, cfg, mem, feats,
                                                 pack.device(),
                                                 train=False))), \
        "dropout inactive — test not exercising the folded path"
    np.testing.assert_allclose(np.asarray(pal), np.asarray(base),
                               rtol=1e-4, atol=1e-5)
