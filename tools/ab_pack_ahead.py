"""Hardware A/B: C++ pack-ahead pipeline vs synchronous packing.

Interleaves fresh-content epochs between the two arms (the tunneled
runtime memoizes repeat dispatches by content — BASELINE.md — so
back-to-back same-arm windows lie).  Timing is block_until_ready on
params only; no D2H in the timed region.

Usage: python tools/ab_pack_ahead.py [n_pairs]
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

    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    cfg = parse_config_dict({
        "sampling": [{"neighbor": [10], "num_thread": 2}],
        "gnn": [{"dim_out": 100, "att_head": 8, "layer": 1}],
        "train": [{"batch_size": 2000, "lr": 1e-4, "dropout": 0.2,
                   "compute_dtype": "bfloat16", "frozen_memory": True}],
    })
    data = synthetic("tgbl-wiki")
    engine = Engine(data, cfg)
    engine.blocks_for("train")
    engine.warm_buckets()
    assert engine.packer.async_available(), "native async packer missing"
    jax.block_until_ready(engine.train_epoch()["loss"])   # compile

    real_async = engine.packer.async_available

    def run_epoch():
        t0 = time.perf_counter()
        st = engine.train_epoch()
        jax.block_until_ready(engine.params)
        dt = time.perf_counter() - t0
        return st["events"] / dt, dict(engine.last_epoch_trace)

    res = {"sync": [], "async": []}
    traces = {"sync": [], "async": []}
    for _ in range(n_pairs):
        for arm in ("sync", "async"):
            engine.packer.async_available = (
                real_async if arm == "async" else (lambda: False))
            eps, tr = run_epoch()
            res[arm].append(eps)
            traces[arm].append(tr)
    engine.packer.async_available = real_async

    for arm in ("sync", "async"):
        r = res[arm]
        tr = traces[arm][-1]
        print(f"{arm:6s}: median {np.median(r)/1e3:8.1f}K e/s  "
              f"all {[round(x/1e3, 1) for x in r]}  "
              f"pack {tr.get('pack_s', 0):.3f}s disp "
              f"{tr.get('disp_s', 0):.3f}s wait {tr.get('wait_s', 0):.3f}s")


if __name__ == "__main__":
    main()
