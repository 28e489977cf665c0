#!/usr/bin/env python
"""Headline benchmark: temporal-edges/sec of TGN training on tgbl-wiki.

Prints ONE JSON line whose core fields are
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
plus measurement-health and roofline fields (VERDICT r2 items 2-4):

  tunnel_rtt_ms     — median round-trip of a tiny fresh-content dispatch,
                      measured immediately before the timed windows.  The
                      tunneled chip's dispatch latency varies >1000x across
                      the day; this is the denominator needed to compare
                      bench numbers across runs.
  windows           — edges/s of every sustained window (the headline
                      value is the MEDIAN of the HEALTHY ones, not
                      best-of — reproducible).
  windows_degraded  — windows (either arm) below 0.55x their arm's best:
                      the tunnel's dispatch latency can collapse MID-RUN
                      (transport throttling, not the chip); degraded
                      windows trigger up to 3 extra interleaved pairs
                      and are excluded from the medians, with the raw
                      rates kept here so the filtering is visible.
  pack_s/disp_s/wait_s — host-phase seconds of the last measured epoch.
  mfu, tflops, hbm_gbps, flops_per_event — analytic roofline accounting
                      (utils/flops.py) at the measured rate vs TPU v5e
                      peaks (197 TFLOP/s bf16, 819 GB/s).
  memory_eps        — edges/s with the REAL mailbox memory enabled
                      (train.frozen_memory=False): the framework's
                      flagship capability.  Measured INTERLEAVED with
                      the frozen arm (frozen window, memory window,
                      frozen window, ... within one tunnel session) —
                      the tunnel's dispatch latency drifts ~2x within a
                      run, so sequential arms confound the code path
                      with the window (VERDICT r4 weak-1; the
                      tools/ab_pack_ahead.py discipline).
  memory_vs_frozen  — median of the per-adjacent-pair memory/frozen
                      ratios (pairwise ratios cancel tunnel drift that
                      a ratio of medians would keep).

Protocol: the flagship TGNN (reference model_utils.py:14-159 math) trains
on a tgbl-wiki-scale synthetic stream (157K events, 9,227 nodes, msg_dim
172 — same shapes as the real dataset; the tgb package cannot download in
a zero-egress environment) with the reference hyperparameters: batch 2000
events, K=10 recency neighbors, hidden 100, 8 heads, 1 negative/event,
dependency-aware blocking.  Steady-state end-to-end training (host
packing + wire transfer + device step + Adam + epoch metrics), compile
excluded.

``vs_baseline`` divides by the reference baseline recorded in
BASELINE.json["measured"] — produced by baselines/reference_torch.py, a
faithful torch re-execution of the reference's per-block sequential math
on this host's hardware (the reference runs `cuda if available else cpu`,
pyg-mem-tgn.py:35; this host has no CUDA).

Env knobs for quick smoke runs: BENCH_MEASURE_BATCHES=N caps each epoch
at N batches (and drops to 1 window); BENCH_SKIP_MEMORY=1 skips the
memory-mode measurement; BENCH_DEVICE_CACHE=1 A/Bs the device-cache mode.
"""
import json
import os
import sys
import time

import numpy as np


def _probe_rtt(n: int = 5) -> float:
    """Median ms round-trip of a tiny dispatch with FRESH content each
    call — the tunneled runtime memoizes repeat dispatches by content
    (BASELINE.md), so a constant probe would measure the cache."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda a: (a * 1.0000001 + 1.0).sum())
    # fresh device-resident inputs prepared OUTSIDE the timed region, so
    # each sample times exactly ONE dispatch (and never re-presents the
    # warmup's content, which the tunnel would serve from its memo)
    xs = [jnp.arange(8, dtype=jnp.float32) + np.float32(i + 1)
          for i in range(n + 1)]
    jax.block_until_ready(xs)
    jax.block_until_ready(f(xs[n]))              # compile outside probe
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f(xs[i]))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1000.0)


def _measure(engine, n_windows: int, epochs_per_window: int = 4):
    """Sustained edges/s per window; each window drains the queue and
    materializes every epoch's stats inside the timed region.  4 epochs
    per window: the end-of-window drain is ONE fixed tunnel round-trip
    (~0.2-0.5 s) that sustained training never pays per epoch — longer
    windows amortize it (and would also EXPOSE any device-side
    throughput shortfall, since backpressure accumulates across the
    window), while the median over 3 windows keeps runs comparable."""
    import jax

    rates = []
    for _ in range(n_windows):
        t0 = time.perf_counter()
        stats = [engine.train_epoch() for _ in range(epochs_per_window)]
        jax.block_until_ready(engine.params)
        events = sum(s["events"] for s in stats)
        assert all(np.isfinite(s["loss"]) for s in stats)
        rates.append(events / (time.perf_counter() - t0))
    return rates


def _measure_eval(engine):
    """Edges/s of a full M=999 chunked validation pass (the other half
    of the TGB protocol, reference epoch_utils.py:15-165; VERDICT r3
    item 6).  One untimed pass compiles the eval buckets; the stream
    state is snapshot/restored around both passes so the measurement
    does not perturb training state."""
    snap = engine.snapshot_stream()
    engine.evaluate("val")                       # compile pass
    engine.restore_stream(snap)
    t0 = time.perf_counter()
    engine.evaluate("val")        # blocks on its single end-of-pass fetch
    dt = time.perf_counter() - t0
    engine.restore_stream(snap)
    return float(engine.data.val_mask.sum()) / dt, dt


def _engine_cost(engine, frozen: bool):
    """Analytic per-step cost from the engine's actual shape buckets."""
    from tgb_tgn_dgl_tpu.utils.flops import count_params, flagship_step_cost

    cfg = engine.config
    K = cfg.sampling.num_neighbors
    skey = (1, False)
    sticky = getattr(engine.packer, "_sticky", {}).get(skey, {})
    P = (cfg.train.max_intra_block
         if cfg.train.max_intra_block is not None
         else sticky.get("P", 32))
    R = sticky.get("R", 6144)
    U = 0 if frozen else sticky.get("Ub", R)
    return flagship_step_cost(
        B=cfg.train.batch_size, R=R, Kp=K + 1 + P,
        F=engine.data.msg_dim, D=cfg.gnn.dim_out, H=cfg.gnn.att_head,
        M=1, U=U, S=cfg.memory.mailbox_size,
        updater=cfg.memory.memory_update,
        n_params=count_params(engine.params), train=True,
        act_bytes=2 if cfg.train.compute_dtype == "bfloat16" else 4)


def main():
    import jax

    from tgb_tgn_dgl_tpu.data.dataset import synthetic
    from tgb_tgn_dgl_tpu.engine.train import Engine
    from tgb_tgn_dgl_tpu.utils.config import parse_config_dict
    from tgb_tgn_dgl_tpu.utils.flops import mfu_report

    sanity = int(os.environ.get("BENCH_MEASURE_BATCHES", "0"))
    n_windows = 1 if sanity else 3

    def make_config(frozen: bool):
        return parse_config_dict({
            "sampling": [{"neighbor": [10], "num_thread": os.cpu_count()}],
            "gnn": [{"dim_out": 100, "att_head": 8, "layer": 1}],
            "train": [{"batch_size": 2000, "lr": 1e-4, "dropout": 0.2,
                       "compute_dtype": "bfloat16",
                       "frozen_memory": frozen,
                       "sanity_batches": sanity,
                       "device_cache":
                           os.environ.get("BENCH_DEVICE_CACHE", "0") == "1"}],
        })

    data = synthetic("tgbl-wiki")
    engine = Engine(data, make_config(frozen=True))
    engine.blocks_for("train")         # one-time preprocessing, untimed
    engine.warm_buckets()
    jax.block_until_ready(engine.train_epoch()["loss"])   # compile epoch

    # build + compile BOTH arms before any timed window so the
    # interleaved windows below measure steady-state dispatch only
    mem_engine = None
    if os.environ.get("BENCH_SKIP_MEMORY", "0") != "1":
        mem_engine = Engine(data, make_config(frozen=False))
        mem_engine.blocks_for("train")
        mem_engine.warm_buckets()
        jax.block_until_ready(mem_engine.train_epoch()["loss"])

    rtt_ms = _probe_rtt()
    # INTERLEAVED arms (VERDICT r4 weak-1): alternate frozen and memory
    # windows so both arms sample the same tunnel-health envelope
    rates, mem_rates = [], []
    for _ in range(n_windows):
        rates += _measure(engine, 1)
        if mem_engine is not None:
            mem_rates += _measure(mem_engine, 1)

    # Tunnel-drift guard: the tunnel's dispatch latency can collapse
    # MID-RUN (windows like [175K, 73K, 75K] with wait_s ~1.2 s — the
    # transport throttling, not the chip; BASELINE.md documents the 2×
    # in-run drift).  A window <0.55× the best window is transport-
    # degraded: run up to 3 extra interleaved window pairs hoping the
    # envelope recovers, then report the median of the HEALTHY set.
    # All raw windows + the degraded count stay in the JSON line, so
    # the filtering is visible, not silent.
    def _healthy(rs):
        if not rs:
            return rs
        thr = 0.55 * max(rs)
        return [r for r in rs if r >= thr]

    def _n_degraded():
        return ((len(rates) - len(_healthy(rates)))
                + (len(mem_rates) - len(_healthy(mem_rates))))

    if not sanity:
        extra = 3
        while extra > 0 and _n_degraded() > 0:
            rates += _measure(engine, 1)
            if mem_engine is not None:
                mem_rates += _measure(mem_engine, 1)
            extra -= 1
    healthy_rates = _healthy(rates)
    n_degraded = _n_degraded()
    eps = float(np.median(healthy_rates))
    trace = getattr(engine, "last_epoch_trace", {})

    # roofline accounting at the measured rate
    mfu = mfu_report(eps, _engine_cost(engine, frozen=True),
                     engine.config.train.batch_size)

    # the M=999 chunked eval path (VERDICT r3 item 6): skipped in smoke
    # runs (BENCH_MEASURE_BATCHES caps train batches but evaluate always
    # runs the full protocol) unless BENCH_EVAL=1 forces it
    eval_eps = eval_s = None
    measure_eval = (os.environ.get("BENCH_SKIP_EVAL", "0") != "1"
                    and (not sanity or os.environ.get("BENCH_EVAL") == "1"))
    if measure_eval:
        eval_eps, eval_s = _measure_eval(engine)

    # real mailbox-memory flagship (frozen_memory=False)
    memory_eps = None
    mem_mfu = None
    mem_vs_frozen = None
    mem_eval_eps = mem_eval_s = None
    if mem_engine is not None:
        memory_eps = float(np.median(_healthy(mem_rates)))
        # per-adjacent-pair ratios: each memory window is compared to
        # the frozen window measured immediately before it; pairs with
        # a transport-degraded member would compare different tunnel
        # regimes, so keep both-healthy pairs (fall back to all pairs
        # when the whole run was degraded)
        fthr = 0.55 * max(rates)
        mthr = 0.55 * max(mem_rates)
        pairs = [(f, m) for f, m in zip(rates, mem_rates)
                 if f >= fthr and m >= mthr] or list(zip(rates, mem_rates))
        ratios = [m / f for f, m in pairs]
        mem_vs_frozen = float(np.median(ratios))
        mem_mfu = mfu_report(memory_eps,
                             _engine_cost(mem_engine, frozen=False),
                             mem_engine.config.train.batch_size)
        if measure_eval:
            mem_eval_eps, mem_eval_s = _measure_eval(mem_engine)

    # multi-host host-work economics (VERDICT r4 item 5): per-host
    # host-side ms per super-batch for both exchange modes, measured on
    # the REAL engine host path (pack + exchange + replan + compose;
    # host_only mode dispatches nothing, so no composed-step compile).
    # These are genuine wall-clock on this host regardless of the
    # device backend — the numbers behind BASELINE.md's
    # owned-vs-replicated crossover, now recorded per round.
    mh_host_ms = None
    if os.environ.get("BENCH_SKIP_MULTIHOST", "0") != "1":
        from tgb_tgn_dgl_tpu.parallel.mh_engine import MultiHostEngine
        mh_host_ms = {}
        for n_hosts in (2, 4, 8):
            for exchange in ("replicated", "owned"):
                eng = MultiHostEngine(data, make_config(frozen=False),
                                      n_hosts=n_hosts, exchange=exchange)
                eng.train_epoch(host_only=True, max_super_batches=2)
                eng.train_epoch(host_only=True, max_super_batches=8)
                tr = eng.last_epoch_trace
                per_sb = tr["host_s"] / max(tr["super_batches"], 1)
                mh_host_ms[f"{exchange}_n{n_hosts}"] = round(
                    per_sb * 1e3, 2)

    baseline_eps = None
    try:
        with open(os.path.join(os.path.dirname(__file__),
                               "BASELINE.json")) as f:
            baseline_eps = json.load(f)["measured"]["reference_torch_eps"]
    except Exception:
        pass
    vs = eps / baseline_eps if baseline_eps else None

    out = {
        "metric": "tgn_train_temporal_edges_per_sec",
        "value": round(eps, 1),
        "unit": "edges/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "tunnel_rtt_ms": round(rtt_ms, 3),
        "windows": [round(r, 1) for r in rates],
        "windows_degraded": n_degraded,
        "pack_s": round(trace.get("pack_s", 0.0), 3),
        "disp_s": round(trace.get("disp_s", 0.0), 3),
        "wait_s": round(trace.get("wait_s", 0.0), 3),
        "flops_per_event": round(mfu["flops_per_event"], 1),
        "tflops": round(mfu["tflops"], 3),
        "mfu": round(mfu["mfu"], 4),
        "hbm_gbps": round(mfu["hbm_gbps"], 1),
        "eval_eps": round(eval_eps, 1) if eval_eps is not None else None,
        "eval_s": round(eval_s, 3) if eval_s is not None else None,
        "eval_protocol": ("slot_unique" if engine._eval_unique_active(
            "val", data.val_ns, engine.config.train.batch_size)[0]
            else "column_chunk"),
        "memory_eps": (round(memory_eps, 1)
                       if memory_eps is not None else None),
        "memory_windows": ([round(r, 1) for r in mem_rates]
                           if mem_rates else None),
        "memory_vs_frozen": (round(mem_vs_frozen, 3)
                             if mem_vs_frozen is not None else None),
        "memory_mfu": (round(mem_mfu["mfu"], 4)
                       if mem_mfu is not None else None),
        "memory_eval_eps": (round(mem_eval_eps, 1)
                            if mem_eval_eps is not None else None),
        "memory_eval_s": (round(mem_eval_s, 3)
                          if mem_eval_s is not None else None),
        "multihost_host_ms": mh_host_ms,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
