#!/usr/bin/env python
"""CLI driver — parity with reference pyg-mem-tgn.py:28-67.

  python run_tgn.py --data tgbl-wiki --config tgb_tgn_dgl_tpu/configs/TGN.yml

Accepts the same two flags as the reference (--data, --config) plus
quality-of-life extensions.  When the named TGB dataset is not on disk
(zero-egress environments), --synthetic generates a deterministic stream
with matching scale statistics (data/dataset.py presets).
"""
import argparse
import sys
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", type=str, required=True,
                        help="dataset name (e.g. tgbl-wiki)")
    parser.add_argument("--config", type=str,
                        default="tgb_tgn_dgl_tpu/configs/TGN.yml",
                        help="path to TGL-schema config file")
    parser.add_argument("--root", type=str, default="datasets",
                        help="dataset root directory")
    parser.add_argument("--synthetic", action="store_true",
                        help="use a synthetic stream with the named "
                             "dataset's scale statistics")
    parser.add_argument("--epochs", type=int, default=None,
                        help="override train.epoch")
    parser.add_argument("--run-test", action="store_true",
                        help="evaluate on the test split after training")
    parser.add_argument("--platform", type=str, default=None,
                        help="force a jax platform (e.g. cpu)")
    parser.add_argument("--log-dir", type=str, default=None,
                        help="write jsonl metrics (and checkpoints with "
                             "--checkpoint-every) under this directory")
    parser.add_argument("--checkpoint-every", type=int, default=0,
                        help="save a full-state checkpoint every N epochs")
    parser.add_argument("--val-snapshot", action="store_true",
                        help="snapshot/restore streaming state around "
                             "each validation pass (the reference's "
                             "unwired backup_memory intent, "
                             "model_utils.py:290-308)")
    parser.add_argument("--resume", type=str, default=None,
                        help="resume deterministically from a full-state "
                             "checkpoint (written by --checkpoint-every); "
                             "trains the remaining epochs up to --epochs")
    parser.add_argument("--patience", type=int, default=0,
                        help="early-stop after N non-improving validations "
                             "(0 = off)")
    parser.add_argument("--profile", action="store_true",
                        help="capture a jax profiler trace of epoch 1 "
                             "into <log-dir>/profile")
    parser.add_argument("--engine", type=str, default="single",
                        choices=("single", "sharded", "multihost"),
                        help="single: one-chip Engine; sharded: "
                             "GSPMD dp/state mesh over all visible "
                             "devices (parallel/engine.py); multihost: "
                             "composed super-batch driver "
                             "(parallel/mh_engine.py)")
    parser.add_argument("--dp", type=int, default=None,
                        help="sharded: data-parallel mesh width "
                             "(default: auto over visible devices)")
    parser.add_argument("--state-ax", type=int, default=None,
                        help="sharded: state-sharding mesh width")
    parser.add_argument("--hosts", type=int, default=2,
                        help="multihost: number of host ranges per "
                             "super-batch")
    parser.add_argument("--exchange", type=str, default="replicated",
                        choices=("replicated", "owned"),
                        help="multihost state maintenance: replicated "
                             "(every host replays all events) or owned "
                             "(node-range owners + boundary gathers — "
                             "per-host work O(events/n))")
    args = parser.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from tgb_tgn_dgl_tpu.data.dataset import load_tgb, synthetic
    from tgb_tgn_dgl_tpu.engine.train import Engine
    from tgb_tgn_dgl_tpu.utils.config import parse_config

    config = parse_config(args.config)
    if args.synthetic:
        data = synthetic(args.data)
    else:
        try:
            data = load_tgb(args.data, root=args.root)
        except FileNotFoundError as e:
            print(f"{e}\nFalling back to synthetic stream.", file=sys.stderr)
            data = synthetic(args.data)

    print(f"dataset: {data.name}  events={data.num_edges}  "
          f"nodes={data.num_nodes}  msg_dim={data.msg_dim}")
    if args.engine == "sharded":
        from tgb_tgn_dgl_tpu.parallel import mesh as mesh_lib
        from tgb_tgn_dgl_tpu.parallel.engine import ShardedEngine
        mesh = mesh_lib.make_mesh(dp=args.dp, state=args.state_ax)
        print(f"engine: sharded over mesh "
              f"{dict(zip(mesh.axis_names, mesh.devices.shape))}")
        engine = ShardedEngine(data, config, mesh=mesh)
    elif args.engine == "multihost":
        from tgb_tgn_dgl_tpu.parallel.mh_engine import MultiHostEngine
        print(f"engine: multihost composed super-batches, "
              f"hosts={args.hosts}, exchange={args.exchange}")
        engine = MultiHostEngine(data, config, n_hosts=args.hosts,
                                 exchange=args.exchange)
    else:
        engine = Engine(data, config)
    if args.resume:
        engine.load_checkpoint(args.resume)
        print(f"resumed from {args.resume} at epoch {engine._epoch}")
        total = args.epochs or config.train.epoch
        args.epochs = max(0, total - engine._epoch)
    early = None
    if args.patience:
        from tgb_tgn_dgl_tpu.engine.checkpoint import EarlyStopMonitor
        early = EarlyStopMonitor(max_round=args.patience,
                                 save_dir=args.log_dir)
    start = time.time()
    if args.profile and args.log_dir:
        from tgb_tgn_dgl_tpu.utils.metrics import profile
        with profile(f"{args.log_dir}/profile"):
            engine.fit(epochs=1, log_dir=args.log_dir)
        remaining = (args.epochs or config.train.epoch) - 1
        if remaining > 0:
            engine.fit(epochs=remaining, early_stop=early,
                       checkpoint_dir=args.log_dir,
                       checkpoint_every=args.checkpoint_every,
                       log_dir=args.log_dir,
                       val_snapshot=args.val_snapshot)
    else:
        engine.fit(epochs=args.epochs, early_stop=early,
                   checkpoint_dir=args.log_dir,
                   checkpoint_every=args.checkpoint_every,
                   log_dir=args.log_dir, val_snapshot=args.val_snapshot)
    if args.run_test:
        t0 = time.time()
        test_metric = engine.evaluate("test")
        print(f"Test {data.eval_metric}: {test_metric: .4f}, "
              f"elapsed Time (s): {time.time() - t0: .4f}")
    print(f"Total Execution Time: {time.time() - start:.6f} seconds")


if __name__ == "__main__":
    main()
