#!/usr/bin/env python
"""Convert a real TGB dataset into this framework's canonical npz.

Run this ON A MACHINE WITH the ``tgb`` pip package (and network access
for the first download); the output npz then feeds ``run_tgn.py --data
<name>`` unmodified on any machine, including zero-egress TPU hosts.

The conversion mirrors exactly what the reference assembles at
/root/reference/utils.py:25-67: ``PyGLinkPropPredDataset`` →
``get_TemporalData()`` event arrays + chronological ``train/val/test``
masks, plus the pre-generated evaluation negative sets served by
``dataset.negative_sampler`` after ``load_val_ns()/load_test_ns()``
(reference utils.py:44-46, epoch_utils.py:43).

Output schema (np.savez_compressed):
  src (E,) int32, dst (E,) int32, t (E,) float32, msg (E, F) float32,
  train_mask / val_mask / test_mask (E,) bool,
  val_ns (E_val, M) int32 and test_ns (E_test, M) int32 when the
  per-event negative lists are rectangular; ragged lists are saved as
  object arrays (loaders handle both — engine/negatives.FixedNegatives
  truncates or pads per ``train.eval_neg_mode``).

Usage:
  python tools/convert_tgb.py --name tgbl-wiki --root ./tgb-data \
      --out datasets/tgbl-wiki.npz
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def convert(name: str, root: str, out: str) -> None:
    try:
        from tgb.linkproppred.dataset_pyg import PyGLinkPropPredDataset
    except ImportError:
        sys.exit("The `tgb` package is required: pip install py-tgb "
                 "(run this converter on a machine with network access)")

    dataset = PyGLinkPropPredDataset(name=name, root=root)
    data = dataset.get_TemporalData()

    src = data.src.numpy().astype(np.int64)
    dst = data.dst.numpy().astype(np.int64)
    t = data.t.numpy().astype(np.float64)
    msg = data.msg.numpy().astype(np.float32)
    if msg.ndim == 1:
        msg = msg[:, None]
    train_mask = dataset.train_mask.numpy().astype(bool)
    val_mask = dataset.val_mask.numpy().astype(bool)
    test_mask = dataset.test_mask.numpy().astype(bool)

    # TGB keeps src and dst in disjoint id ranges already; keep raw ids
    # (the reference does too — num_nodes = max id + 1).
    arrays = dict(
        src=src.astype(np.int32), dst=dst.astype(np.int32),
        t=t.astype(np.float32), msg=msg,
        train_mask=train_mask, val_mask=val_mask, test_mask=test_mask,
        # TGB datasets declare their metric ('mrr' or 'hits@k'); the
        # engines build their jitted finalizer from this field
        eval_metric=np.asarray(
            getattr(dataset, "eval_metric", None) or "mrr"),
    )

    # Pre-generated eval negatives, in event order per split (the order
    # the reference's epoch loop queries them, epoch_utils.py:28,43).
    ns = dataset.negative_sampler
    for split, mask in (("val", val_mask), ("test", test_mask)):
        getattr(dataset, f"load_{split}_ns")()
        s, d, tt = src[mask], dst[mask], t[mask]
        lists = ns.query_batch(
            _as_tensor(s), _as_tensor(d), _as_tensor(tt),
            split_mode=split)
        lens = {len(l) for l in lists}
        if len(lens) == 1:
            arr = np.asarray(lists, dtype=np.int32)
        else:                                    # ragged -> object array
            arr = np.empty(len(lists), object)
            for i, l in enumerate(lists):
                arr[i] = np.asarray(l, dtype=np.int32)
            print(f"note: {split} negative lists are ragged "
                  f"(lengths {sorted(lens)[:5]}...); saved as object "
                  f"array — use train.eval_neg_mode='pad_mask'")
        arrays[f"{split}_ns"] = arr

    # (object arrays — ragged negative sets — pickle automatically on
    # save; only np.load needs allow_pickle, handled by data/dataset.py)
    np.savez_compressed(out, **arrays)
    print(f"wrote {out}: E={len(src)} N={max(src.max(), dst.max()) + 1} "
          f"F={msg.shape[1]} val={val_mask.sum()} test={test_mask.sum()}")


def _as_tensor(a):
    import torch

    return torch.as_tensor(a)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--name", required=True, help="e.g. tgbl-wiki")
    ap.add_argument("--root", default="datasets",
                    help="tgb download/cache root")
    ap.add_argument("--out", default=None,
                    help="output npz (default datasets/<name>.npz)")
    args = ap.parse_args()
    convert(args.name, args.root, args.out or f"datasets/{args.name}.npz")


if __name__ == "__main__":
    main()
