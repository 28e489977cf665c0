#!/usr/bin/env python
"""Hardware A/B: train.remat (jax.checkpoint on the memory-mode embed).

BASELINE.md round-5 census: the memory arm's backward re-materializes
the (R, Kp, ·) gathered-feature grids and their layout conversions —
277 MB of copies per scanned batch vs the frozen step's 178.  With
remat, those grids are RECOMPUTED during backward (gathers fuse into
consumers, so the recompute is near-free FLOPs-wise) instead of saved
across the forward→backward boundary, which can delete the
layout-conversion copies — or add kernels and lose, since kernel count
is the binding cost on tunneled runtimes.  This measures which.

Interleaves fresh-content epochs between the two arms within one tunnel
window (the tunneled runtime memoizes repeat dispatches by content and
its latency drifts 2× within a run — BASELINE.md), alternating arm
order pair-to-pair.  Memory arm only: frozen steps have no grid
residuals to rematerialize.

Usage: python tools/ab_remat.py [n_pairs]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from tgb_tgn_dgl_tpu.data.dataset import synthetic
    from tgb_tgn_dgl_tpu.engine.train import Engine
    from tgb_tgn_dgl_tpu.utils.config import parse_config_dict

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_pairs = int(args[0]) if args else 3

    def make(remat):
        cfg = parse_config_dict({
            "sampling": [{"neighbor": [10], "num_thread": 2}],
            "memory": [{"type": "node", "dim_out": 100, "dim_time": 100}],
            "gnn": [{"dim_out": 100, "att_head": 8, "layer": 1}],
            "train": [{"batch_size": 2000, "lr": 1e-4, "dropout": 0.2,
                       "compute_dtype": "bfloat16",
                       "frozen_memory": False,
                       "remat": remat}],
        })
        e = Engine(data, cfg)
        e.blocks_for("train")
        e.warm_buckets()
        jax.block_until_ready(e.train_epoch()["loss"])   # compile
        return e

    data = synthetic("tgbl-wiki")
    engines = {"plain": make(False), "remat": make(True)}

    def run_epoch(e):
        t0 = time.perf_counter()
        st = e.train_epoch()
        jax.block_until_ready(e.params)
        dt = time.perf_counter() - t0
        return st["events"] / dt

    res = {"plain": [], "remat": []}
    for i in range(n_pairs):
        order = ("plain", "remat") if i % 2 == 0 else ("remat", "plain")
        for arm in order:
            res[arm].append(run_epoch(engines[arm]))
    for arm in ("plain", "remat"):
        r = np.asarray(res[arm])
        print(f"{arm:6s} eps: {np.round(r, 1).tolist()} "
              f"median {np.median(r):.1f}")
    print(f"remat/plain: "
          f"{np.median(res['remat']) / np.median(res['plain']):.3f} "
          f"(memory arm)")


if __name__ == "__main__":
    main()
