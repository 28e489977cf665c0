"""Negative sampling.

Train-time: uniform over the unique destination universe with collision
resampling against the positives — parity with reference
``NegLinkSamplerDest`` (neg_sampler.py:8-23, universe built at
pyg-mem-tgn.py:39,44), iterative instead of recursive.

Eval-time: fixed pre-generated negative sets (the role of TGB's
load_val_ns/load_test_ns, reference utils.py:44-47), served per batch like
``neg_sampler.query_batch`` (epoch_utils.py:43) with either the
reference's truncate-to-min handling (epoch_utils.py:48-56) or pad+mask.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class NegLinkSamplerDest:
    def __init__(self, dst_nodes: np.ndarray, seed: int = 0):
        self.dst_nodes = np.asarray(dst_nodes)
        self.rng = np.random.default_rng(seed)

    def sample(self, pos_dst: np.ndarray) -> np.ndarray:
        n = len(pos_dst)
        out = self.dst_nodes[self.rng.integers(0, len(self.dst_nodes), n)]
        # collision resampling (reference resamples only colliding entries)
        for _ in range(64):
            bad = out == pos_dst
            nb = int(bad.sum())
            if nb == 0:
                break
            out[bad] = self.dst_nodes[
                self.rng.integers(0, len(self.dst_nodes), nb)]
        return out.astype(np.int32)


class FixedNegatives:
    """Pre-generated eval negatives, indexed by event row within a split."""

    def __init__(self, ns: np.ndarray, mode: str = "truncate_min"):
        self.ns = np.asarray(ns)
        self.mode = mode

    def query_batch(self, lo: int, hi: int) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """Negatives for split rows [lo, hi): returns (neg (B, M), mask or
        None).  With rectangular storage truncate_min == identity; ragged
        (object-array) storage is truncated or padded per mode."""
        rows = self.ns[lo:hi]
        if rows.dtype != object:
            return rows.astype(np.int32), None
        lens = np.array([len(r) for r in rows])
        if self.mode == "truncate_min":
            m = int(lens.min())
            out = np.stack([np.asarray(r[:m]) for r in rows])
            return out.astype(np.int32), None
        m = int(lens.max())
        out = np.zeros((len(rows), m), np.int32)
        mask = np.zeros((len(rows), m), bool)
        for i, r in enumerate(rows):
            out[i, :len(r)] = r
            mask[i, :len(r)] = True
        return out, mask
