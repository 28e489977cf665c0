#!/usr/bin/env python
"""A/B: compact (narrow-dtype) wire vs full WirePack on the live backend.

Two engines train on the same tgbl-wiki-scale synthetic stream with
alternating epochs (A, B, A, B, ...) so both see the same distribution of
tunnel/link conditions.  Per CLAUDE.md, same-content microbenchmarks lie
on the tunneled backend (content-memoized dispatches), so we measure
whole fresh-state epochs, interleaved.

Usage: python baselines/ab_wire_compact.py [epochs_per_arm]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def make_engine(wire_compact: bool):
    from tgb_tgn_dgl_tpu.data.dataset import synthetic
    from tgb_tgn_dgl_tpu.engine.train import Engine
    from tgb_tgn_dgl_tpu.utils.config import parse_config_dict

    data = synthetic("tgbl-wiki")
    config = parse_config_dict({
        "sampling": [{"neighbor": [10]}],
        "gnn": [{"dim_out": 100, "att_head": 8, "layer": 1}],
        "train": [{"batch_size": 2000, "lr": 1e-4,
                   "compute_dtype": "bfloat16",
                   "wire_compact": wire_compact}],
    })
    eng = Engine(data, config)
    eng.blocks_for("train")
    return eng


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    arms = {"compact": make_engine(True), "full": make_engine(False)}
    # warmup (compile) both
    for name, eng in arms.items():
        t0 = time.perf_counter()
        eng.train_epoch()
        jax.block_until_ready(eng.params)
        print(f"warmup {name}: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
    results = {k: [] for k in arms}
    for i in range(n):
        for name, eng in arms.items():
            t0 = time.perf_counter()
            stats = eng.train_epoch()
            jax.block_until_ready(eng.params)
            secs = time.perf_counter() - t0
            eps = stats["events"] / secs
            results[name].append(eps)
            print(f"epoch {i} {name}: {eps:,.0f} e/s", file=sys.stderr)
    print(json.dumps({k: {"best": max(v), "all": [round(x) for x in v]}
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
