#!/usr/bin/env python
"""Hardware A/B: two train.fuse_steps values, interleaved.

The blob wire removed the per-array H2D fixed cost that made large
fused groups lose in round 2; round 5's G=8-vs-16 sweep then measured
G=16 winning 1.14-1.19× pairwise (BASELINE.md).  This generalizes the
harness to any two G values so the ladder (24, 32, ...) can be probed
on the real tunneled chip: larger G amortizes the dispatch RTT further,
but also raises the host pack burst per dispatch and the program size.

Interleaves fresh-content epochs between the two arms within one tunnel
window, alternating arm order pair-to-pair (the tunneled runtime
memoizes repeat dispatches by content and its latency drifts 2× within
a run — BASELINE.md).

Usage: python tools/ab_fuse.py G_A G_B [n_pairs] [--memory]
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
    ga, gb = int(args[0]), int(args[1])
    n_pairs = int(args[2]) if len(args) > 2 else 3
    memory = "--memory" in sys.argv

    def make(g):
        cfg = parse_config_dict({
            "sampling": [{"neighbor": [10], "num_thread": 2}],
            "memory": [{"type": "node", "dim_out": 100, "dim_time": 100}],
            "gnn": [{"dim_out": 100, "att_head": 8, "layer": 1}],
            "train": [{"batch_size": 2000, "lr": 1e-4, "dropout": 0.2,
                       "compute_dtype": "bfloat16",
                       "frozen_memory": not memory,
                       "fuse_steps": g}],
        })
        e = Engine(data, cfg)
        e.blocks_for("train")
        e.warm_buckets()
        jax.block_until_ready(e.train_epoch()["loss"])   # compile
        return e

    data = synthetic("tgbl-wiki")
    names = (f"G={ga}", f"G={gb}")
    engines = {names[0]: make(ga), names[1]: make(gb)}

    def run_epoch(e):
        t0 = time.perf_counter()
        st = e.train_epoch()
        jax.block_until_ready(e.params)
        dt = time.perf_counter() - t0
        return st["events"] / dt

    res = {n: [] for n in names}
    for i in range(n_pairs):
        order = names if i % 2 == 0 else names[::-1]
        for arm in order:
            res[arm].append(run_epoch(engines[arm]))
    for arm in names:
        r = np.asarray(res[arm])
        print(f"{arm:6s} eps: {np.round(r, 1).tolist()} "
              f"median {np.median(r):.1f}")
    print(f"{names[1]}/{names[0]}: "
          f"{np.median(res[names[1]]) / np.median(res[names[0]]):.3f} "
          f"({'memory' if memory else 'frozen'} arm)")


if __name__ == "__main__":
    main()
