#!/usr/bin/env python
"""Hardware A/B: train-lean wire (device-derived train Δt) vs ship-Δt.

The train dedup wire's three f32 Δt fields are ~55% of its bytes, and
H2D bandwidth is ~half the per-fused-group wall on tunneled hosts
(BASELINE.md round 5).  wire_train_lean drops them and re-derives the
Δt grids on device from the global time table + a pre-batch (Ub,)
clock row + ONE order-key scatter-max + ONE cummax (bit-exact —
tests/test_wire.py::test_dedup_wire_train_lean_exact).  Round 2
measured a FULL device clock replay at 63K e/s vs 100K+ ship-dt — but
that predates the fused/unrolled programs and priced every kernel at
the 0.8 ms host-dispatch cost; in-program kernels cost ~5-10 µs
(round-4 census), so the trade deserves this re-measurement.

Interleaved fresh-content epochs, arm order alternating per pair.

Usage: python tools/ab_train_lean.py [n_pairs] [--memory]
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

    data = synthetic("tgbl-wiki")

    def make(lean):
        cfg = parse_config_dict({
            "sampling": [{"neighbor": [10], "num_thread": 2}],
            "gnn": [{"dim_out": 100, "att_head": 8, "layer": 1}],
            "train": [{"batch_size": 2000, "lr": 1e-4, "dropout": 0.2,
                       "compute_dtype": "bfloat16",
                       "frozen_memory": not memory,
                       "wire_train_lean": lean}],
        })
        e = Engine(data, cfg)
        e.blocks_for("train")
        e.warm_buckets()
        jax.block_until_ready(e.train_epoch()["loss"])   # compile
        return e

    engines = {"ship": make(False), "lean": make(True)}

    def run_epoch(e):
        t0 = time.perf_counter()
        st = e.train_epoch()
        jax.block_until_ready(e.params)
        dt = time.perf_counter() - t0
        return st["events"] / dt

    res = {"ship": [], "lean": []}
    for i in range(n_pairs):
        order = ("ship", "lean") if i % 2 == 0 else ("lean", "ship")
        for arm in order:
            res[arm].append(run_epoch(engines[arm]))
    for arm in ("ship", "lean"):
        r = np.asarray(res[arm])
        print(f"{arm:5s} eps: {np.round(r, 1).tolist()} "
              f"median {np.median(r):.1f}")
    print(f"lean/ship: "
          f"{np.median(res['lean']) / np.median(res['ship']):.3f} "
          f"({'memory' if memory else 'frozen'} arm)")


if __name__ == "__main__":
    main()
