#!/usr/bin/env python
"""Multi-device scaling benchmark for the sharded flagship train step.

Runs the FULL memory train step (wire expansion, mailbox apply/commit,
edge attention, BCE/Adam with psum'd grads) over ("dp", "state") meshes
of increasing dp width and reports per-step time + events/s per mesh.

Prints one JSON line per mesh:
  {"devices": N, "dp": d, "state": s, "step_ms": ..., "events_per_s": ...}

On real multi-chip TPU hardware (jax.device_count() > 1 natively) the
events/s column IS the scaling curve — the north-star metric of
BASELINE.json ("N-host scaling efficiency").  On a single-chip or
CPU-only host the script self-forces a virtual 8-device CPU mesh
(xla_force_host_platform_device_count), which validates that the sharded
program compiles and executes at every mesh shape but does NOT measure
real scaling: the virtual devices share the host's cores, so efficiency
numbers are meaningless there (the output is tagged "virtual": true).
"""
import json
import os
import sys
import time

import numpy as np


def main():
    # Platform locks at first backend init and this environment's
    # sitecustomize force-registers a remote single-chip TPU, so choose
    # BEFORE touching jax.devices(): BENCH_SCALING_TPU=1 keeps the native
    # platform (use on a real multi-chip slice); the default forces the
    # virtual 8-device CPU mesh via jax.config (tests/conftest.py recipe —
    # env vars alone are too late under sitecustomize).
    virtual = not os.environ.get("BENCH_SCALING_TPU")
    if virtual:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    if virtual:
        jax.config.update("jax_platforms", "cpu")
    platform = jax.devices()[0].platform

    import optax

    import __graft_entry__ as ge
    from tgb_tgn_dgl_tpu.models.memory import (MemoryModelConfig,
                                               init_memory_params,
                                               init_memory_state)
    from tgb_tgn_dgl_tpu.ops.wire import pack_to_wire
    from tgb_tgn_dgl_tpu.parallel import mesh as mesh_lib
    from tgb_tgn_dgl_tpu.parallel.sharded import (
        build_sharded_memory_train_step)

    n = jax.device_count()
    K = 10
    B = 512
    model_cfg, params, memory, feats, pack, data = ge._make_example(
        batch_size=B, num_nodes=4096, msg_dim=32, hidden=64, heads=4,
        num_neighbors=K)
    mem_cfg = MemoryModelConfig(num_nodes=data.num_nodes,
                                raw_msg_dim=data.msg_dim,
                                memory_dim=64, time_dim=64)
    params["memory"] = init_memory_params(jax.random.PRNGKey(7), mem_cfg)
    optimizer = optax.adam(1e-4)
    wire = pack_to_wire(pack, K)
    iw = pack.nbr_kind.shape[1] - K - 1
    rng = jax.random.PRNGKey(0)

    shapes = [(dp, st) for dp, st in
              [(1, 1), (2, 1), (4, 1), (8, 1), (2, 2), (4, 2)]
              if dp * st <= n]
    for dp, state in shapes:
        mesh = mesh_lib.make_mesh(dp * state, dp=dp, state=state)
        step, placement = build_sharded_memory_train_step(
            model_cfg, mem_cfg, optimizer, mesh, num_neighbors=K,
            intra_width=iw)
        # fresh param copies per mesh: the step donates its state args and
        # device_put may alias host buffers, so reusing `params` across
        # meshes would hand the jit already-deleted arrays
        params_i = jax.tree.map(lambda a: np.array(a), params)
        mem_state = init_memory_state(mem_cfg)
        opt_state = optimizer.init(params_i)
        args = placement(params_i, opt_state, mem_state, feats, wire)
        out = step(*args, rng)          # compile + warm
        jax.block_until_ready(out[0])
        p2, o2, m2 = out[0], out[1], out[2]
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            p2, o2, m2, loss, _, _ = step(p2, o2, m2, args[3], args[4],
                                          rng)
        jax.block_until_ready(p2)
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(json.dumps({
            "devices": dp * state, "dp": dp, "state": state,
            "step_ms": round(ms, 3),
            "events_per_s": round(B / (ms / 1e3), 1),
            "platform": platform, "virtual": bool(virtual),
        }))

    # ---- epoch-level sweep: the ShardedEngine driver (fused dispatch,
    # CompactWire, on-device eval accumulation) over the same meshes ----
    from tgb_tgn_dgl_tpu.data.dataset import synthetic
    from tgb_tgn_dgl_tpu.parallel.engine import ShardedEngine
    from tgb_tgn_dgl_tpu.utils.config import parse_config_dict

    edata = synthetic("bench-scaling", num_edges=8192, num_nodes=512,
                      msg_dim=16, num_neg=8, seed=4)
    for dp, state in shapes:
        config = parse_config_dict({
            "sampling": [{"neighbor": [10]}],
            "memory": [{"dim_out": 64, "dim_time": 64}],
            "gnn": [{"dim_out": 64, "att_head": 4, "dim_time": 64}],
            "train": [{"batch_size": 512, "lr": 1e-3,
                       "frozen_memory": False, "fuse_steps": 4}],
        })
        eng = ShardedEngine(edata, config,
                            mesh=mesh_lib.make_mesh(dp * state, dp=dp,
                                                    state=state))
        eng.warm_buckets()
        eng.train_epoch()                       # compile + warm
        eng.dispatch_count = 0
        t0 = time.perf_counter()
        stats = eng.train_epoch()
        secs = time.perf_counter() - t0
        print(json.dumps({
            "engine_epoch": True, "devices": dp * state, "dp": dp,
            "state": state, "epoch_s": round(secs, 3),
            "events_per_s": round(stats["events"] / secs, 1),
            "dispatches": eng.dispatch_count,
            "platform": platform, "virtual": bool(virtual),
        }))

    # ---- multi-host driver sweep: composed super-batches with the real
    # mailbox memory, replicated vs owned host-state maintenance.  The
    # epoch seconds on shared virtual devices are not a scaling curve,
    # but the HOST-side phase economics (the pack/apply/replay costs the
    # owned design targets) are real wall-clock on this host either way
    # (BASELINE.md "multi-host host-work scaling"). ----
    from tgb_tgn_dgl_tpu.parallel.mh_engine import MultiHostEngine

    for n_hosts in (2, 4):
        for exchange in ("replicated", "owned"):
            config = parse_config_dict({
                "sampling": [{"neighbor": [10]}],
                "memory": [{"dim_out": 64, "dim_time": 64}],
                "gnn": [{"dim_out": 64, "att_head": 4, "dim_time": 64}],
                "train": [{"batch_size": 512, "lr": 1e-3,
                           "frozen_memory": False}],
            })
            eng = MultiHostEngine(edata, config, n_hosts=n_hosts,
                                  exchange=exchange)
            eng.train_epoch()                   # compile + warm
            t0 = time.perf_counter()
            stats = eng.train_epoch()
            secs = time.perf_counter() - t0
            print(json.dumps({
                "multihost_epoch": True, "hosts": n_hosts,
                "exchange": exchange, "epoch_s": round(secs, 3),
                "events_per_s": round(stats["events"] / secs, 1),
                "loss": round(float(stats["loss"]), 4),
                "platform": platform, "virtual": bool(virtual),
            }))


if __name__ == "__main__":
    main()
