#!/usr/bin/env python
"""Eval-path benchmark: seconds per full M=999 TGB validation pass.

Measures the slot-unique protocol (train.eval_slot_unique, default
auto) against the column-chunk protocol on the bench stream, with the
stream state snapshot/restored around every pass and a tunnel-RTT probe
bracketing each measurement (the tunneled chip's dispatch latency
drifts; compare passes at similar RTT).  MRR must be IDENTICAL across
protocols — it is asserted.

Usage: python tools/bench_eval.py [n_rounds]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rtt():
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda a: (a * 1.0000001 + 1.0).sum())
    xs = [jnp.arange(8, dtype=jnp.float32) + np.float32(i + 1)
          for i in range(6)]
    jax.block_until_ready(xs)
    jax.block_until_ready(f(xs[5]))
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(xs[i]))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1000)


def main():
    import jax

    from tgb_tgn_dgl_tpu.data.dataset import synthetic
    from tgb_tgn_dgl_tpu.engine.train import Engine
    from tgb_tgn_dgl_tpu.utils.config import parse_config_dict

    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    def make(unique):
        return parse_config_dict({
            "sampling": [{"neighbor": [10], "num_thread": os.cpu_count()}],
            "gnn": [{"dim_out": 100, "att_head": 8, "layer": 1}],
            "train": [{"batch_size": 2000, "lr": 1e-4, "dropout": 0.2,
                       "compute_dtype": "bfloat16", "frozen_memory": True,
                       "eval_slot_unique": unique}],
        })

    data = synthetic("tgbl-wiki")
    engine = Engine(data, make(True))
    engine.blocks_for("train")
    engine.warm_buckets()
    jax.block_until_ready(engine.train_epoch()["loss"])
    snap = engine.snapshot_stream()

    import tgb_tgn_dgl_tpu.engine.train as T
    real_active = T.Engine._eval_unique_active

    def force(active):
        T.Engine._eval_unique_active = (
            real_active if active
            else (lambda self, split, ns, B: (False, 0)))

    mrrs = {}
    for arm in ("unique", "chunked"):           # compile both once
        force(arm == "unique")
        engine.evaluate("val")
        engine.restore_stream(snap)
    for _ in range(n_rounds):
        for arm in ("unique", "chunked"):
            force(arm == "unique")
            r0 = _rtt()
            t0 = time.perf_counter()
            mrr = engine.evaluate("val")
            dt = time.perf_counter() - t0
            engine.restore_stream(snap)
            mrrs.setdefault(arm, mrr)
            assert mrr == mrrs[arm]
            print(f"{arm:8s}: {dt:6.1f} s/pass  mrr {mrr:.4f}  "
                  f"rtt {r0:6.2f} ms", flush=True)
    T.Engine._eval_unique_active = real_active
    assert abs(mrrs["unique"] - mrrs["chunked"]) == 0.0, mrrs


if __name__ == "__main__":
    main()
