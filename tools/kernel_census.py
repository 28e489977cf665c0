#!/usr/bin/env python
"""Kernel census of the compiled train step.

On the tunneled runtime every XLA kernel carries a fixed dispatch
overhead (~0.8 ms — BASELINE.md), so KERNEL COUNT per batch, not FLOPs,
is the cost model.  This tool compiles the engine's fused train step and
reports how many kernel-launching instructions the optimized HLO
executes per scanned batch, grouped by op kind and (for fusions) by the
ops they contain — the shopping list for kernel-reduction work.

Usage:  python tools/kernel_census.py [--memory] [--fuse G]
"""
import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def census(hlo_text: str):
    """Parse optimized HLO: find the while-loop body computation (the
    lax.scan over batches) and count its kernel-launching instructions;
    also count top-level (once-per-dispatch) instructions."""
    # split into computations (header = "%name (" or "ENTRY %name (" at
    # column 0, body ends at a bare "}")
    comps = {}
    cur = None
    for line in hlo_text.splitlines():
        m = re.match(r"(ENTRY\s+)?%?([\w\.\-]+)\s+\(", line)
        if m and not line.startswith(" "):
            cur = m.group(2)
            comps[cur] = []
        elif cur is not None and line.strip() == "}":
            cur = None
        elif cur is not None:
            comps[cur].append(line)
    return comps


def count_launches(lines):
    counts = collections.Counter()
    fusion_details = collections.Counter()
    for ln in lines:
        s = ln.strip()
        m = re.match(r"%?[\w\.\-]+ = \S+ ([\w\-]+)\(", s)
        if not m:
            continue
        op = m.group(1)
        counts[op] += 1
        if op == "fusion":
            fk = re.search(r"kind=(\w+)", s)
            fusion_details[fk.group(1) if fk else "?"] += 1
    return counts, fusion_details


NONLAUNCH = {"parameter", "constant", "get-tuple-element", "tuple",
             "bitcast", "after-all", "partition-id", "replica-id"}


def report(name, lines):
    counts, fdet = count_launches(lines)
    launches = {k: v for k, v in counts.items() if k not in NONLAUNCH}
    total = sum(launches.values())
    print(f"\n== {name}: ~{total} kernel-launching instructions ==")
    for op, n in sorted(launches.items(), key=lambda kv: -kv[1]):
        extra = (f"  ({dict(fdet)})" if op == "fusion" else "")
        print(f"  {op:24s} {n}{extra}")
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--memory", action="store_true",
                    help="memory-enabled step (frozen_memory=False)")
    ap.add_argument("--fuse", type=int, default=8)
    ap.add_argument("--unroll", choices=["auto", "true", "false"],
                    default="auto",
                    help="fuse_unroll knob (auto = engine default)")
    ap.add_argument("--dump", help="write full HLO to this path")
    ap.add_argument("--intra", type=int, default=32,
                    help="train.max_intra_block (grid width Kp = "
                         "neighbors + 1 + this; probe lane-alignment "
                         "effects, e.g. 37 -> Kp=48)")
    args = ap.parse_args()

    from tgb_tgn_dgl_tpu.data.dataset import synthetic
    from tgb_tgn_dgl_tpu.engine.train import Engine
    from tgb_tgn_dgl_tpu.utils.config import parse_config_dict

    config = parse_config_dict({
        "sampling": [{"neighbor": [10]}],
        "gnn": [{"dim_out": 100, "att_head": 8, "layer": 1}],
        "train": [{"batch_size": 2000, "lr": 1e-4, "dropout": 0.2,
                   "compute_dtype": "bfloat16",
                   "max_intra_block": args.intra,
                   "fuse_steps": args.fuse,
                   "fuse_unroll": {"auto": None, "true": True,
                                   "false": False}[args.unroll],
                   "frozen_memory": not args.memory}],
    })
    data = synthetic("tgbl-wiki")
    engine = Engine(data, config)
    engine.blocks_for("train")

    # pack a few real batches to get representative wire shapes; group by
    # the engine's fuse key (same shapes -> same compiled program)
    from tgb_tgn_dgl_tpu.engine.train import _wire_key
    it = engine._prefetch("train")
    groups = {}
    wires = None
    for lo, hi, wire, iw_ in it:
        key = (_wire_key(iw_, wire), iw_)
        groups.setdefault(key, []).append(wire)
        if len(groups[key]) == args.fuse:
            wires, iw = groups[key], iw_
            break
    if wires is None:
        (keyiw, wires) = max(groups.items(), key=lambda kv: len(kv[1]))
        iw = keyiw[1]
        wires = wires[: args.fuse]
        print(f"note: only {len(wires)} same-shape batches found")
    from tgb_tgn_dgl_tpu.ops.wire import stack_wires
    stacked = stack_wires(wires)

    import jax
    import jax.numpy as jnp
    acc = jnp.zeros(4, jnp.float32)
    rng = jax.random.PRNGKey(0)

    fused = engine._fused_train_step
    if engine.use_memory:
        lowered = fused.lower(engine.params, engine.opt_state,
                              engine.mem_state, engine._tables, stacked,
                              rng, acc, iw)
    else:
        lowered = fused.lower(engine.params, engine.opt_state,
                              engine.memory, engine._tables, stacked,
                              rng, acc, iw)
    compiled = lowered.compile()
    txt = compiled.as_text()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(txt)
    comps = census(txt)

    # the scan = the while op's body computation; find it from the while
    # instruction's body= attribute, then count its launches.  An
    # UNROLLED fused step has no while loop — everything lives in main,
    # and per-batch = main / G.
    body_names = set(re.findall(r"body=%?([\w\.\-]+)", txt))
    per_batch = 0
    for name in body_names:
        if name in comps:
            per_batch += report(f"{name} (per scanned batch)", comps[name])
    main_total = 0
    for name, lines in comps.items():
        if name.startswith("main"):
            main_total += report(f"{name} (once per dispatch)", lines)
    if per_batch:
        print(f"\nTOTAL per-batch (scan body) kernel launches: {per_batch}")
    else:
        per_batch = main_total / max(args.fuse, 1)
        print(f"\nUNROLLED program: {main_total} launches per dispatch "
              f"= {per_batch:.1f} per batch (G={args.fuse})")
    print(f"At 0.8 ms fixed/kernel that is {per_batch * 0.8:.1f} ms/batch "
          f"floor on the tunneled runtime.")


if __name__ == "__main__":
    main()
