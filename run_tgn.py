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
    engine = Engine(data, config)
    start = time.time()
    engine.fit(epochs=args.epochs)
    if args.run_test:
        t0 = time.time()
        test_metric = engine.evaluate("test")
        print(f"Test {data.eval_metric}: {test_metric: .4f}, "
              f"elapsed Time (s): {time.time() - t0: .4f}")
    print(f"Total Execution Time: {time.time() - start:.6f} seconds")


if __name__ == "__main__":
    main()
