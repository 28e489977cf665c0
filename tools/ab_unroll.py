#!/usr/bin/env python
"""Hardware A/B: fused-group lax.scan vs python-unrolled straight-line.

VERDICT r4 item 8 / BASELINE.md round-4 census: the scan carry
double-buffers the full (params, Adam mu/nu, acc) pytree — 124 of the
fused step's 274 per-batch kernel launches are copies.  The unrolled
fused step (train.fuse_unroll=True) emits straight-line code with no
while-loop carry, trading those copies for a G×-larger program (longer
compile, once).  This measures whether the copies matter end-to-end on
the real device.

Interleaves fresh-content epochs between the two arms within one tunnel
window (the tunneled runtime memoizes repeat dispatches by content and
its latency drifts 2× within a run — BASELINE.md), alternating arm
order pair-to-pair.  Timing is block_until_ready on params only.

Usage: python tools/ab_unroll.py [n_pairs] [--memory]
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
    memory = "--memory" in sys.argv

    def make(unroll):
        cfg = parse_config_dict({
            "sampling": [{"neighbor": [10], "num_thread": 2}],
            "gnn": [{"dim_out": 100, "att_head": 8, "layer": 1}],
            "train": [{"batch_size": 2000, "lr": 1e-4, "dropout": 0.2,
                       "compute_dtype": "bfloat16",
                       "frozen_memory": not memory,
                       "fuse_unroll": unroll}],
        })
        e = Engine(data, cfg)
        e.blocks_for("train")
        e.warm_buckets()
        jax.block_until_ready(e.train_epoch()["loss"])   # compile
        return e

    data = synthetic("tgbl-wiki")
    engines = {"scan": make(False), "unroll": make(True)}

    def run_epoch(e):
        t0 = time.perf_counter()
        st = e.train_epoch()
        jax.block_until_ready(e.params)
        dt = time.perf_counter() - t0
        return st["events"] / dt

    res = {"scan": [], "unroll": []}
    for i in range(n_pairs):
        order = ("scan", "unroll") if i % 2 == 0 else ("unroll", "scan")
        for arm in order:
            res[arm].append(run_epoch(engines[arm]))
    for arm in ("scan", "unroll"):
        r = np.asarray(res[arm])
        print(f"{arm:7s} eps: {np.round(r, 1).tolist()} "
              f"median {np.median(r):.1f}")
    print(f"unroll/scan: "
          f"{np.median(res['unroll']) / np.median(res['scan']):.3f} "
          f"({'memory' if memory else 'frozen'} arm)")


if __name__ == "__main__":
    main()
