#!/usr/bin/env python
"""Decompose steady-state ms/batch on the live backend.

Arms:
  pack    — host packing only (no device work)
  wire    — pack + ship stacked compact wires to a TRIVIAL jitted
            consumer (isolates H2D + dispatch overhead; args are
            transferred whether or not the program uses them)
  step    — pack + the real fused train step (full pipeline)

Fresh wire content per dispatch (the tunnel memoizes repeated content).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def make_engine():
    from tgb_tgn_dgl_tpu.data.dataset import synthetic
    from tgb_tgn_dgl_tpu.engine.train import Engine
    from tgb_tgn_dgl_tpu.utils.config import parse_config_dict

    data = synthetic("tgbl-wiki")
    config = parse_config_dict({
        "sampling": [{"neighbor": [10]}],
        "gnn": [{"dim_out": 100, "att_head": 8, "layer": 1}],
        "train": [{"batch_size": 2000, "lr": 1e-4,
                   "compute_dtype": "bfloat16"}],
    })
    eng = Engine(data, config)
    eng.blocks_for("train")
    return eng


def main():
    eng = make_engine()
    G = eng.config.train.fuse_steps

    @jax.jit
    def trivial(wires):
        tot = jnp.float32(0)
        for a in jax.tree_util.tree_leaves(wires):
            tot = tot + a.astype(jnp.float32).ravel()[0]
        return tot

    def run_arm(arm, epochs=2):
        best = None
        for _ in range(epochs):
            eng.packer.reset_cache()
            pend = []
            t0 = time.perf_counter()
            n = 0
            handles = []
            for lo, hi, wire, iw in eng._prefetch("train"):
                n += hi - lo
                if arm == "pack":
                    continue
                pend.append(wire)
                if len(pend) < G:
                    continue
                stacked = type(pend[0])(*(
                    (np.stack([getattr(w, f) for w in pend])
                     if getattr(pend[0], f) is not None else None)
                    for f in type(pend[0])._fields))
                handles.append(trivial(stacked))
                if len(handles) > 8:
                    jax.block_until_ready(handles.pop(0))
                pend = []
            jax.block_until_ready(handles) if handles else None
            secs = time.perf_counter() - t0
            best = min(best or 1e9, secs)
        return best

    def run_step(epochs=2):
        best = None
        for _ in range(epochs):
            t0 = time.perf_counter()
            stats = eng.train_epoch()
            jax.block_until_ready(eng.params)
            secs = time.perf_counter() - t0
            best = min(best or 1e9, secs)
        return best, stats["events"]

    # warm compiles
    eng.train_epoch()
    jax.block_until_ready(eng.params)
    run_arm("wire", epochs=1)

    nb = 0
    for _ in eng._iter_batches("train"):
        nb += 1
    pack_s = run_arm("pack")
    wire_s = run_arm("wire")
    step_s, events = run_step()
    print(f"batches/epoch: {nb}  events: {events}")
    print(f"pack : {pack_s:6.2f} s/epoch  {1e3 * pack_s / nb:6.2f} ms/batch")
    print(f"wire : {wire_s:6.2f} s/epoch  {1e3 * wire_s / nb:6.2f} ms/batch")
    print(f"step : {step_s:6.2f} s/epoch  {1e3 * step_s / nb:6.2f} ms/batch"
          f"  ({events / step_s:,.0f} e/s)")


if __name__ == "__main__":
    main()
