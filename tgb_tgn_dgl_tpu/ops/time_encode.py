"""Fourier time encoding: phi(t) = cos(w*t + b).

Capability parity with the reference ``TimeEncode``
(reference model_utils.py:201-237): a learnable Linear(1, d) whose weight
is initialized to the fixed TGL frequency ladder w_i = 1 / 10**linspace(0,
9, d) and zero bias, followed by cos.  Pure dense VPU work — no kernel
needed; XLA fuses the affine+cos into surrounding ops.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def init_time_encode(dim: int, dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """TGL initialization (reference model_utils.py:228-230)."""
    w = (1.0 / 10 ** np.linspace(0, 9, dim)).astype(np.float32)
    return {
        "w": jnp.asarray(w, dtype=dtype),
        "b": jnp.zeros((dim,), dtype=dtype),
    }


def time_encode(params: Dict[str, jnp.ndarray], t: jnp.ndarray) -> jnp.ndarray:
    """cos(w * t + b); t of shape (...,) -> (..., dim)."""
    return jnp.cos(t[..., None] * params["w"] + params["b"])
