"""Parameter initializers matching the reference's torch init semantics.

MRR parity depends on the init *distributions* (not bitwise values):
xavier_normal_ with relu gain for the attention projections (reference
model_utils.py:550-558), torch.nn.Linear defaults (kaiming-uniform weight
= U(±1/sqrt(fan_in)) and U(±1/sqrt(fan_in)) bias) elsewhere.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

RELU_GAIN = math.sqrt(2.0)


def xavier_normal(key, shape, gain=RELU_GAIN, dtype=jnp.float32):
    """torch.nn.init.xavier_normal_ semantics: for 2D (out, in) tensors
    fan_in=in, fan_out=out; for >2D (a, b, *rest) fan_in=b*prod(rest),
    fan_out=a*prod(rest)."""
    if len(shape) == 2:
        fan_out, fan_in = shape
    else:
        receptive = 1
        for s in shape[2:]:
            receptive *= s
        fan_in = shape[1] * receptive
        fan_out = shape[0] * receptive
    std = gain * math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def linear_default(key, out_dim, in_dim, bias=True, dtype=jnp.float32):
    """torch.nn.Linear default init: W=(out,in) kaiming_uniform(a=sqrt(5))
    == U(±1/sqrt(in)); bias U(±1/sqrt(in)).  Stored transposed (in, out)
    for row-major jnp matmuls."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    w = jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound, bound)
    if not bias:
        return {"w": w}
    b = jax.random.uniform(kb, (out_dim,), dtype, -bound, bound)
    return {"w": w, "b": b}


def linear_xavier(key, out_dim, in_dim, gain=RELU_GAIN, bias=True,
                  dtype=jnp.float32):
    """xavier_normal_ weight + torch-default bias, as the reference's
    reset_parameters does for fc_node/fc_edge (model_utils.py:552-553:
    only the weight is re-initialized; the bias keeps Linear defaults)."""
    kw, kb = jax.random.split(key)
    w = xavier_normal(kw, (out_dim, in_dim), gain, dtype).T
    if not bias:
        return {"w": w}
    bound = 1.0 / math.sqrt(in_dim)
    b = jax.random.uniform(kb, (out_dim,), dtype, -bound, bound)
    return {"w": w, "b": b}


def apply_linear(p, x):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def dropout(key, x, rate, deterministic):
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    # Draw the mask FLAT and reshape: for 3D activations XLA picks a
    # different layout for the rng-bit-generator output than the
    # consumer wants and inserts a full-tensor u32 relayout copy
    # (~180 MB for the (R, Kp, F) edge mask — profiled at ~1.2 ms/batch
    # on v5e); a flat draw reshapes contiguously instead.
    mask = jax.random.bernoulli(key, keep, (x.size,)).reshape(x.shape)
    return jnp.where(mask, x / keep, 0.0)


# Per-lane odd constants (golden-ratio / sqrt-fraction style) for cheap
# additive key derivation.  Four lanes cover the widest key layout (rbg);
# threefry keys use the first two.
_DERIVE_C = np.array([0x9E3779B9, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A],
                     dtype=np.uint32)


def derive_key(key, i):
    """Cheap per-consumer subkey: ``key_data + i · C`` — ONE u32 vector
    add instead of a threefry ``fold_in``/``split`` chain (~60 scalar HLO
    instructions each; the per-batch train step spends ~40% of its
    instructions on those chains, BASELINE.md perf model).

    Statistically sound for mask generation under both impls: the
    generator (threefry, or the TPU hardware rbg path) hashes the key at
    DRAW time, so additively-distinct keys give independent streams —
    dropout masks don't need the adversarial key separation ``fold_in``
    provides.  Distinctness contract: every (key, i) pair reachable in
    one program must have a globally unique flattened index — the engine
    strides its per-step indices by 64 and model code keeps its local
    offsets < 64 (tgnn_embed uses 8·layer + q, q ≤ 5).

    ``i`` may be a Python int or a traced scalar."""
    kd = jax.random.key_data(key)
    c = jnp.asarray(_DERIVE_C[: kd.shape[-1]])
    return jax.random.wrap_key_data(kd + jnp.uint32(i) * c,
                                    impl=jax.random.key_impl(key))
