#!/usr/bin/env python
"""Headline benchmark: temporal-edges/sec of TGN training on tgbl-wiki.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Protocol: the flagship TGNN (reference model_utils.py:14-159 math) trains
on a tgbl-wiki-scale synthetic stream (157K events, 9,227 nodes, msg_dim
172 — same shapes as the real dataset; the tgb package cannot download in
a zero-egress environment) with the reference hyperparameters: batch 2000
events, K=10 recency neighbors, hidden 100, 8 heads, 1 negative/event,
dependency-aware blocking.  We time steady-state end-to-end training
(host packing + device step + param update), excluding compilation, and
report events/sec.

``vs_baseline`` divides by the reference baseline recorded in
BASELINE.json["measured"] — produced by baselines/reference_torch.py, a
faithful torch re-execution of the reference's per-block sequential math
on this host's hardware (the reference runs `cuda if available else cpu`,
pyg-mem-tgn.py:35; this host has no CUDA).
"""
import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    from tgb_tgn_dgl_tpu.data.dataset import synthetic
    from tgb_tgn_dgl_tpu.engine.train import Engine
    from tgb_tgn_dgl_tpu.utils.config import parse_config_dict

    warm_batches = int(os.environ.get("BENCH_WARM_BATCHES", "20"))
    measure_batches = int(os.environ.get("BENCH_MEASURE_BATCHES", "30"))

    data = synthetic("tgbl-wiki")
    config = parse_config_dict({
        "sampling": [{"neighbor": [10], "num_thread": os.cpu_count()}],
        "gnn": [{"dim_out": 100, "att_head": 8, "layer": 1}],
        "train": [{"batch_size": 2000, "lr": 1e-4, "dropout": 0.2,
                   "compute_dtype": "bfloat16"}],
    })
    engine = Engine(data, config)
    d = engine.data

    # Precompute per-batch host work lists once (dependency blocks are
    # one-time preprocessing in the reference too, utils.py:55-57).
    batches = list(engine._iter_batches("train"))

    def run(n, t_budget=None):
        """Run n train batches end-to-end, return (events, seconds)."""
        done = 0
        t0 = time.perf_counter()
        i = 0
        while done < n:
            lo, hi, rows, blk = batches[i % len(batches)]
            if i % len(batches) == 0:
                engine.packer.reset_cache()
            src, dst, t = d.src[rows], d.dst[rows], d.t[rows]
            neg = engine.neg_sampler.sample(dst)
            pack = engine.packer.pack(src, dst, t, rows, blk, neg)
            engine._rng, sk = jax.random.split(engine._rng)
            from tgb_tgn_dgl_tpu.ops.wire import pack_to_wire
            K = engine.config.sampling.num_neighbors
            wire = pack_to_wire(pack, K)
            iw = pack.nbr_kind.shape[1] - K - 1
            out = engine._train_step(engine.params, engine.opt_state,
                                     engine.memory, engine.feats,
                                     wire, sk, iw)
            engine.params, engine.opt_state = out[0], out[1]
            done += 1
            i += 1
            if t_budget and time.perf_counter() - t0 > t_budget:
                break
        jax.block_until_ready(engine.params)
        return done, time.perf_counter() - t0

    # Warmup: trigger compilation for the shape buckets.
    run(warm_batches, t_budget=300)
    n, secs = run(measure_batches, t_budget=240)
    events = n * config.train.batch_size
    eps = events / secs

    baseline_eps = None
    try:
        with open(os.path.join(os.path.dirname(__file__), "BASELINE.json")) as f:
            baseline_eps = json.load(f)["measured"]["reference_torch_eps"]
    except Exception:
        pass
    vs = eps / baseline_eps if baseline_eps else None

    print(json.dumps({
        "metric": "tgn_train_temporal_edges_per_sec",
        "value": round(eps, 1),
        "unit": "edges/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
