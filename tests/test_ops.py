"""Unit tests for ops/ against numpy oracles (SURVEY.md §4 test pyramid)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tgb_tgn_dgl_tpu.ops.segment import (masked_softmax, segment_last,
                                         segment_mean, segment_softmax)
from tgb_tgn_dgl_tpu.ops.time_encode import init_time_encode, time_encode


def test_time_encode_matches_reference_init():
    # reference model_utils.py:228-230: w = 1/10**linspace(0,9,d), b = 0.
    p = init_time_encode(10)
    t = jnp.array([1.0])
    out = np.asarray(time_encode(p, t))[0]
    w = 1 / 10 ** np.linspace(0, 9, 10)
    np.testing.assert_allclose(out, np.cos(w * 1.0), rtol=1e-6)
    # docstring example (model_utils.py:216-220)
    assert abs(out[0] - 0.5403) < 1e-3 and abs(out[1] - 0.9950) < 1e-3


def test_segment_softmax_oracle():
    rng = np.random.default_rng(0)
    E, S = 64, 7
    logits = rng.normal(size=(E, 4)).astype(np.float32)
    seg = rng.integers(0, S, E)
    mask = rng.random(E) < 0.8
    out = np.asarray(segment_softmax(jnp.array(logits), jnp.array(seg), S,
                                     mask=jnp.array(mask)))
    for s in range(S):
        sel = (seg == s) & mask
        if sel.sum() == 0:
            continue
        ex = np.exp(logits[sel] - logits[sel].max(0))
        np.testing.assert_allclose(out[sel], ex / ex.sum(0), rtol=1e-5)
    assert np.all(out[~mask] == 0)


def test_masked_softmax_matches_segment_softmax():
    rng = np.random.default_rng(1)
    R, K = 8, 5
    logits = rng.normal(size=(R, K)).astype(np.float32)
    mask = rng.random((R, K)) < 0.7
    mask[:, 0] = True
    dense = np.asarray(masked_softmax(jnp.array(logits), jnp.array(mask),
                                      axis=1))
    seg = np.repeat(np.arange(R), K)
    sparse = np.asarray(segment_softmax(jnp.array(logits.ravel()),
                                        jnp.array(seg), R,
                                        mask=jnp.array(mask.ravel())))
    np.testing.assert_allclose(dense.ravel(), sparse, rtol=1e-5, atol=1e-7)


def test_segment_last_oracle():
    # reference LastAggregator (modules/msg_agg.py:15-21)
    msg = jnp.array([[1.0], [2.0], [3.0], [4.0]])
    seg = jnp.array([0, 0, 2, 2])
    t = jnp.array([5.0, 7.0, 1.0, 1.0])  # tie in segment 2 -> last index
    out = np.asarray(segment_last(msg, seg, t, 3))
    np.testing.assert_allclose(out[:, 0], [2.0, 0.0, 4.0])


def test_segment_mean_oracle():
    msg = jnp.array([[2.0], [4.0], [6.0]])
    seg = jnp.array([0, 0, 1])
    out = np.asarray(segment_mean(msg, seg, 3))
    np.testing.assert_allclose(out[:, 0], [3.0, 6.0, 0.0])
