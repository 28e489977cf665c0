#!/usr/bin/env python
"""Interleaved-epoch sweep of engine knobs on the live backend.

Each arm is a config patch; arms run alternating epochs (round-robin) so
all see the same distribution of tunnel conditions.  Fresh state per
epoch (cache reset), fresh wire content per batch.

Usage: python baselines/sweep_knobs.py [epochs_per_arm]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

ARMS = {
    "base": {},
    "pallas": {"gnn": {"use_pallas": True}},
    "G4": {"train": {"fuse_steps": 4}},
    "G12": {"train": {"fuse_steps": 12}},
    "inflight2": {"train": {"max_inflight_batches": 2}},
    "inflight32": {"train": {"max_inflight_batches": 32}},
}


def make_engine(patch):
    from tgb_tgn_dgl_tpu.data.dataset import synthetic
    from tgb_tgn_dgl_tpu.engine.train import Engine
    from tgb_tgn_dgl_tpu.utils.config import parse_config_dict

    data = synthetic("tgbl-wiki")
    base = {
        "sampling": [{"neighbor": [10]}],
        "gnn": [{"dim_out": 100, "att_head": 8, "layer": 1}],
        "train": [{"batch_size": 2000, "lr": 1e-4,
                   "compute_dtype": "bfloat16"}],
    }
    for sec, kv in patch.items():
        base.setdefault(sec, [{}])[0].update(kv)
    eng = Engine(data, parse_config_dict(base))
    eng.blocks_for("train")
    return eng


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    arms = {k: make_engine(v) for k, v in ARMS.items()
            if only is None or k in only}
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
            eps = stats["events"] / (time.perf_counter() - t0)
            results[name].append(eps)
            print(f"epoch {i} {name}: {eps:,.0f} e/s", file=sys.stderr)
    print(json.dumps({k: {"best": round(max(v)),
                          "all": [round(x) for x in v]}
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
