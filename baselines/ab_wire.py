"""Interleaved A/B: wire_dedup vs wire_compact end-to-end train epochs.

The tunneled chip's dispatch latency varies >1000x across the day
(BASELINE.md), so A/B runs must interleave fresh-content epochs from
both variants in the same window.  Usage:

    python baselines/ab_wire.py [rounds]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from tgb_tgn_dgl_tpu.data.dataset import synthetic
from tgb_tgn_dgl_tpu.engine.train import Engine
from tgb_tgn_dgl_tpu.utils.config import parse_config_dict


def build(wire_dedup):
    data = synthetic("tgbl-wiki")
    config = parse_config_dict({
        "sampling": [{"neighbor": [10]}],
        "gnn": [{"dim_out": 100, "att_head": 8, "layer": 1}],
        "train": [{"batch_size": 2000, "lr": 1e-4, "dropout": 0.2,
                   "compute_dtype": "bfloat16",
                   "wire_dedup": wire_dedup}],
    })
    eng = Engine(data, config)
    eng.blocks_for("train")
    return eng


def epoch_secs(eng):
    t0 = time.perf_counter()
    stats = eng.train_epoch()
    jax.block_until_ready(eng.params)
    secs = time.perf_counter() - t0
    return stats["events"] / secs


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    engines = {"dedup": build(True), "compact": build(False)}
    for name, eng in engines.items():
        eng.train_epoch()["loss"]          # warm compile
    results = {k: [] for k in engines}
    for r in range(rounds):
        # alternate order to cancel within-round tunnel drift
        order = list(engines.items())
        if r % 2:
            order.reverse()
        for name, eng in order:
            results[name].append(epoch_secs(eng))
            print(f"round {r} {name:8s} {results[name][-1]:,.0f} e/s",
                  flush=True)
    for name, vals in results.items():
        print(f"{name:8s} best {max(vals):,.0f}  median "
              f"{sorted(vals)[len(vals)//2]:,.0f} e/s")


if __name__ == "__main__":
    main()
