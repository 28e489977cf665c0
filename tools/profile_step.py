#!/usr/bin/env python
"""Measured cost split of the fused train dispatch on the live backend.

Phases, each timed with FRESH batch content (the tunneled runtime
memoizes repeat dispatches by content — BASELINE.md):

  h2d_ms      — jax.device_put of one stacked G-batch wire, blocked
  exec_ms     — fused step on device-resident wires, blocked
                (one dispatch RTT + device execution)
  piped_ms    — N groups dispatched back-to-back from numpy wires, one
                final block: the engine's actual steady-state pattern

Usage: python tools/profile_step.py [--memory] [--fuse G] [--groups N]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--memory", action="store_true")
    ap.add_argument("--fuse", type=int, default=8)
    ap.add_argument("--groups", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tgb_tgn_dgl_tpu.data.dataset import synthetic
    from tgb_tgn_dgl_tpu.engine.train import Engine, _wire_key
    from tgb_tgn_dgl_tpu.ops.wire import stack_wires
    from tgb_tgn_dgl_tpu.utils.config import parse_config_dict

    config = parse_config_dict({
        "sampling": [{"neighbor": [10]}],
        "gnn": [{"dim_out": 100, "att_head": 8, "layer": 1}],
        "train": [{"batch_size": 2000, "lr": 1e-4, "dropout": 0.2,
                   "compute_dtype": "bfloat16", "fuse_steps": args.fuse,
                   "frozen_memory": not args.memory}],
    })
    data = synthetic("tgbl-wiki")
    engine = Engine(data, config)
    engine.blocks_for("train")

    # pack the whole epoch, group by fuse key, keep the modal key's groups
    groups = {}
    for lo, hi, wire, iw in engine._prefetch("train"):
        key = (_wire_key(iw, wire), iw)
        groups.setdefault(key, []).append(wire)
    (key, iw_t), wires = max(groups.items(), key=lambda kv: len(kv[1]))
    iw = iw_t
    n_groups = min(args.groups, len(wires) // args.fuse)
    stacked = [stack_wires(wires[i * args.fuse:(i + 1) * args.fuse])
               for i in range(n_groups)]
    G = args.fuse
    print(f"{len(wires)} same-shape batches -> {n_groups} groups of {G}")

    fused = engine._fused_train_step
    acc = jnp.zeros(4, jnp.float32)
    rng = jax.random.PRNGKey(0)

    def run(st, a):
        if engine.use_memory:
            (engine.params, engine.opt_state, engine.mem_state, a,
             h) = fused(engine.params, engine.opt_state, engine.mem_state,
                        engine._tables, st, rng, a, iw)
        else:
            (engine.params, engine.opt_state, a, h) = fused(
                engine.params, engine.opt_state, engine.memory,
                engine._tables, st, rng, a, iw)
        return a, h

    # compile (content of group 0 enters the tunnel memo — never re-time it)
    acc, h = run(stacked[0], acc)
    jax.block_until_ready(h)

    # wire bytes per group
    nbytes = sum(np.asarray(x).nbytes for x in stacked[0] if x is not None)
    print(f"wire bytes/group: {nbytes / 1e6:.2f} MB "
          f"({nbytes / G / 1e6:.3f} MB/batch)")

    # H2D: device_put fresh groups
    h2d = []
    dev = []
    for st in stacked[1:]:
        t0 = time.perf_counter()
        d = jax.device_put(st)
        jax.block_until_ready(d)
        h2d.append(time.perf_counter() - t0)
        dev.append(d)
    print(f"h2d_ms/group: {[round(t * 1e3, 1) for t in h2d]} "
          f"-> {np.median(h2d) * 1e3 / G:.2f} ms/batch")

    # exec: device-resident wires, fresh content each call
    ex = []
    for d in dev:
        t0 = time.perf_counter()
        acc, h = run(d, acc)
        jax.block_until_ready(h)
        ex.append(time.perf_counter() - t0)
    print(f"exec_ms/group (dispatch+run): "
          f"{[round(t * 1e3, 1) for t in ex]} "
          f"-> {np.median(ex) * 1e3 / G:.2f} ms/batch")

    # pipelined: numpy wires, back-to-back dispatch, one drain.  Content
    # is fresh (same arrays, but params/rng advanced -> fresh programs?
    # no — content-memo keys on inputs; params changed, so it is fresh).
    t0 = time.perf_counter()
    for st in stacked[1:]:
        acc, h = run(st, acc)
    jax.block_until_ready(h)
    piped = time.perf_counter() - t0
    nb = (len(stacked) - 1) * G
    print(f"piped: {piped * 1e3:.1f} ms for {nb} batches "
          f"-> {piped * 1e3 / nb:.2f} ms/batch "
          f"({2000 * nb / piped / 1e3:.0f}K edges/s)")


if __name__ == "__main__":
    main()
