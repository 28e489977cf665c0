"""Tests for DyRep/JODIE variant primitives (models/variants.py)."""
import numpy as np

import jax
import jax.numpy as jnp

from tgb_tgn_dgl_tpu.models.variants import (EagerMemoryConfig,
                                             eager_apply_mail, eager_commit,
                                             init_eager_memory_params,
                                             init_eager_memory_state,
                                             init_time_embedding,
                                             time_embedding)
from tgb_tgn_dgl_tpu.ops.recurrent import rnn_cell


def test_eager_memory_roundtrip():
    cfg = EagerMemoryConfig(num_nodes=10, mail_dim=6, memory_dim=4)
    params = init_eager_memory_params(jax.random.PRNGKey(0), cfg)
    state = init_eager_memory_state(cfg, mailbox_size=1)
    N = cfg.num_nodes

    # write mail to nodes 2 and 5
    mw_node = jnp.asarray([2, 5], jnp.int32)
    mw_slot = jnp.zeros(2, jnp.int32)
    mail = jnp.asarray(np.random.default_rng(0).normal(size=(2, 6)),
                       jnp.float32)
    mw_t = jnp.asarray([1.0, 2.0])
    mw_eid = jnp.asarray([0, 1], jnp.int32)
    uniq0 = jnp.full(4, N, jnp.int32)  # nothing applied yet
    mem_rows, lu_rows = eager_apply_mail(params, cfg, state, uniq0)
    state = eager_commit(cfg, state, uniq0, mem_rows, lu_rows,
                         mw_node, mw_slot, mail, mw_t, mw_eid)
    assert bool(state.mail_valid[2, 0]) and bool(state.mail_valid[5, 0])

    # apply at next read
    uniq = jnp.asarray([2, 5, 7, N], jnp.int32)
    mem_rows, lu_rows = eager_apply_mail(params, cfg, state, uniq)
    # oracle: RNN cell on the stored mail
    want2 = rnn_cell(params["cell"], mail[0][None],
                     jnp.zeros((1, 4)))[0]
    np.testing.assert_allclose(np.asarray(mem_rows[0]), np.asarray(want2),
                               rtol=1e-5)
    assert float(lu_rows[0]) == 1.0
    assert float(lu_rows[1]) == 2.0
    # untouched node: unchanged
    np.testing.assert_array_equal(np.asarray(mem_rows[2]), np.zeros(4))
    # commit clears mail
    state = eager_commit(cfg, state, uniq, mem_rows, lu_rows,
                         jnp.full(2, N, jnp.int32), mw_slot,
                         jnp.zeros((2, 6)), jnp.zeros(2),
                         jnp.zeros(2, jnp.int32))
    assert not bool(state.mail_valid[2, 0])
    np.testing.assert_allclose(np.asarray(state.mem[2]), np.asarray(want2),
                               rtol=1e-5)


def test_eager_memory_mean_combine():
    cfg = EagerMemoryConfig(num_nodes=5, mail_dim=3, memory_dim=4,
                            combine="mean")
    params = init_eager_memory_params(jax.random.PRNGKey(1), cfg)
    state = init_eager_memory_state(cfg, mailbox_size=2)
    N = cfg.num_nodes
    mw_node = jnp.asarray([1, 1], jnp.int32)
    mw_slot = jnp.asarray([0, 1], jnp.int32)
    mail = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]])
    state = eager_commit(cfg, state, jnp.full(1, N, jnp.int32),
                         state.mem[N:N + 1], state.last_update[N:N + 1],
                         mw_node, mw_slot, mail,
                         jnp.asarray([1.0, 2.0]), jnp.asarray([0, 1],
                                                              jnp.int32))
    uniq = jnp.asarray([1, N], jnp.int32)
    mem_rows, lu = eager_apply_mail(params, cfg, state, uniq)
    want = rnn_cell(params["cell"], jnp.asarray([[0.5, 0.5, 0.0]]),
                    jnp.zeros((1, 4)))[0]
    np.testing.assert_allclose(np.asarray(mem_rows[0]), np.asarray(want),
                               rtol=1e-5)
    assert float(lu[0]) == 2.0


def test_time_embedding_jodie():
    p = init_time_embedding(jax.random.PRNGKey(0), 8)
    mem = jnp.ones((3, 8))
    dt = jnp.asarray([0.0, 1.0, 2.0])
    z = time_embedding(p, mem, dt)
    # dt=0: z = mem * (1 + b) = mem (b init zero)
    np.testing.assert_allclose(np.asarray(z[0]), np.ones(8), rtol=1e-6)
    assert not np.allclose(np.asarray(z[1]), np.ones(8))
