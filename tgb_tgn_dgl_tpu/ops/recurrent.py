"""GRU / vanilla-RNN cells for node-memory updates.

Capability parity with the cuDNN cells the reference relies on
(reference modules/memory_module.py:72-78: ``GRUCell``/``RNNCell``;
model_utils.py:377-384).  On TPU these are plain dense matmuls — MXU
work, no custom kernel needed (SURVEY.md §2.3).

torch.nn.GRUCell math (gate order r, z, n) with torch's default
U(±1/sqrt(hidden)) init for all weights and biases, so parity runs see
the same init distributions.
"""
from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp


def init_gru_cell(key, input_dim: int, hidden_dim: int,
                  dtype=jnp.float32) -> Dict:
    """torch.nn.GRUCell layout: w_ih (in, 3H), w_hh (H, 3H), b_ih/b_hh
    (3H,) — gates ordered [reset, update, new]."""
    k = jax.random.split(key, 4)
    bound = 1.0 / math.sqrt(hidden_dim)

    def u(kk, shape):
        return jax.random.uniform(kk, shape, dtype, -bound, bound)

    return {
        "w_ih": u(k[0], (input_dim, 3 * hidden_dim)),
        "w_hh": u(k[1], (hidden_dim, 3 * hidden_dim)),
        "b_ih": u(k[2], (3 * hidden_dim,)),
        "b_hh": u(k[3], (3 * hidden_dim,)),
    }


def gru_cell(p: Dict, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """x (..., in), h (..., H) -> h' (..., H).  torch.nn.GRUCell forward:
    r = σ(W_ir x + b_ir + W_hr h + b_hr)
    z = σ(W_iz x + b_iz + W_hz h + b_hz)
    n = tanh(W_in x + b_in + r * (W_hn h + b_hn))
    h' = (1 − z) n + z h
    """
    H = h.shape[-1]
    gi = x @ p["w_ih"] + p["b_ih"]
    gh = h @ p["w_hh"] + p["b_hh"]
    i_r, i_z, i_n = gi[..., :H], gi[..., H:2 * H], gi[..., 2 * H:]
    h_r, h_z, h_n = gh[..., :H], gh[..., H:2 * H], gh[..., 2 * H:]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def init_rnn_cell(key, input_dim: int, hidden_dim: int,
                  dtype=jnp.float32) -> Dict:
    """torch.nn.RNNCell (tanh) layout and init."""
    k = jax.random.split(key, 4)
    bound = 1.0 / math.sqrt(hidden_dim)

    def u(kk, shape):
        return jax.random.uniform(kk, shape, dtype, -bound, bound)

    return {
        "w_ih": u(k[0], (input_dim, hidden_dim)),
        "w_hh": u(k[1], (hidden_dim, hidden_dim)),
        "b_ih": u(k[2], (hidden_dim,)),
        "b_hh": u(k[3], (hidden_dim,)),
    }


def rnn_cell(p: Dict, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    return jnp.tanh(x @ p["w_ih"] + p["b_ih"] + h @ p["w_hh"] + p["b_hh"])


CELLS = {"gru": (init_gru_cell, gru_cell), "rnn": (init_rnn_cell, rnn_cell)}
