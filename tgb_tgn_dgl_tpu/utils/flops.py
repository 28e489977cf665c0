"""Analytic cost model: flops + HBM bytes per flagship training step.

SURVEY.md §5.1 names roofline reporting as a required aux subsystem; the
reference has nothing (wall-clock prints only, pyg-mem-tgn.py:53-67).
This model counts the dense work of one packed batch through the
flagship TGNN step (models/tgnn.py, scalar message mode with concat-free
edge projections) so bench.py can report achieved TFLOP/s, % of peak
(MFU) and HBM GB/s against the chip's roofline.

Conventions: a fused multiply-add counts as 2 flops; backward pass of a
matmul chain costs 2x its forward; elementwise/VPU work is counted where
it is within ~10x of the matmul term (time encode, softmax) and dropped
otherwise.  Byte counts assume the compute dtype for activations and
f32 for params/optimizer state, counting each major intermediate once
for write + once for read (XLA fusion removes many of these — the bytes
number is an UPPER bound on required traffic, so achieved/peak is a
LOWER bound on HBM efficiency).

Peak numbers (TPU v5e, public spec): 197 TFLOP/s bf16, 819 GB/s HBM.
"""
from __future__ import annotations

from typing import Dict

V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_HBM_BPS = 819e9


def count_params(params) -> int:
    import jax
    import numpy as np

    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(params)))


def flagship_step_cost(
    *,
    B: int,                 # events per batch
    R: int,                 # padded root slots
    Kp: int,                # in-edges per root slot (K + 1 + P)
    F: int,                 # edge feature dim
    D: int,                 # hidden dim
    H: int,                 # attention heads
    M: int = 1,             # negatives per event
    U: int = 0,             # unique-node rows (memory mode), 0 = frozen
    S: int = 1,             # mailbox slots
    updater: str = "gru",   # memory cell ('gru' = 3 gates, 'rnn' = 1)
    n_params: int = 0,
    train: bool = True,
    act_bytes: int = 2,     # bf16 activations
) -> Dict[str, float]:
    """Flops + HBM bytes for ONE step (forward [+backward+Adam])."""
    E = R * Kp              # in-edge grid cells
    # --- forward: embedding ------------------------------------------
    f_te = 3.0 * E * D                       # cos(w*dt+b)
    f_el = 2.0 * E * D * H                   # src projection -> heads
    f_ee = 2.0 * E * (F + D) * H             # split edge projection
    f_er = 2.0 * R * D * H                   # root projection
    f_attn = 10.0 * E * H                    # leaky+softmax+weighted sum
    fwd_embed = f_te + f_el + f_ee + f_er + f_attn
    # --- forward: predictor ------------------------------------------
    towers = B * (2 + M)                     # src/pos towers + M negs
    fwd_pred = 2.0 * towers * D * D + 2.0 * towers * D
    # --- forward: mailbox memory (0 when frozen) ---------------------
    fwd_mem = 0.0
    if U:
        msg_dim = 2 * D + F + D
        gates = 3 if updater == "gru" else 1
        fwd_mem = (2.0 * U * gates * (msg_dim + D) * D    # cell matmuls
                   + 3.0 * U * S * D)                     # Δt encode
    fwd = fwd_embed + fwd_pred + fwd_mem
    # --- backward + optimizer ----------------------------------------
    bwd = 2.0 * fwd if train else 0.0
    adam = 10.0 * n_params if train else 0.0
    flops = fwd + bwd + adam

    # --- HBM bytes (major intermediates, fwd+bwd) --------------------
    grid_bytes = E * (F + 2 * D + 3 * H) * act_bytes      # ef, te, mem, el/ee/a
    mem_bytes = (U * (S * (2 * D + F + D) + 2 * D) * act_bytes) if U else 0
    passes = 3.0 if train else 1.0           # fwd + bwd reads/writes
    param_bytes = (3 * 4 * n_params * 2) if train else 4 * n_params
    bytes_ = passes * (grid_bytes + mem_bytes) + param_bytes
    return {
        "flops": float(flops),
        "bytes": float(bytes_),
        "flops_fwd": float(fwd),
        "arithmetic_intensity": float(flops / max(bytes_, 1.0)),
    }


def mfu_report(events_per_sec: float, cost: Dict[str, float],
               events_per_step: int,
               peak_flops: float = V5E_PEAK_BF16_FLOPS,
               peak_bps: float = V5E_PEAK_HBM_BPS) -> Dict[str, float]:
    """Achieved TFLOP/s, MFU and HBM utilization at a measured rate."""
    steps_per_sec = events_per_sec / max(events_per_step, 1)
    achieved_flops = steps_per_sec * cost["flops"]
    achieved_bps = steps_per_sec * cost["bytes"]
    return {
        "flops_per_event": cost["flops"] / max(events_per_step, 1),
        "tflops": achieved_flops / 1e12,
        "mfu": achieved_flops / peak_flops,
        "hbm_gbps": achieved_bps / 1e9,
        "hbm_util": achieved_bps / peak_bps,
    }
