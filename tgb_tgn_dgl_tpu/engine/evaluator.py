"""Metrics: TGB-protocol MRR evaluator plus AP/AUC self-checks.

Replaces the external TGB ``Evaluator`` (reference utils.py:10,47;
epoch_utils.py:108-113) and sklearn's average_precision/roc_auc
(epoch_utils.py:5,312-315) with vectorized numpy — identical metric
definitions so parity checks are apples-to-apples (SURVEY.md §5.5).
"""
from __future__ import annotations

import numpy as np


def mrr(y_pred_pos: np.ndarray, y_pred_neg: np.ndarray,
        neg_mask: np.ndarray | None = None) -> np.ndarray:
    """Per-event reciprocal rank, TGB/OGB tie convention: rank = mean of the
    optimistic rank (#neg strictly better) and pessimistic rank (#neg at
    least as good), + 1.  y_pred_pos (B,), y_pred_neg (B, M); optional
    neg_mask (B, M) for the pad-and-mask negative mode (SURVEY.md §7.5)."""
    pos = y_pred_pos[:, None]
    better = y_pred_neg > pos
    at_least = y_pred_neg >= pos
    if neg_mask is not None:
        better = better & neg_mask
        at_least = at_least & neg_mask
    opt = better.sum(axis=1)
    pes = at_least.sum(axis=1)
    rank = 0.5 * (opt + pes) + 1.0
    return 1.0 / rank


def parse_eval_metric(metric: str):
    """Split a TGB linkproppred metric name into (kind, k): 'mrr' →
    ('mrr', 0), 'hits@K' → ('hits', K).  TGB's Evaluator surface for
    link prediction is exactly these two families (reference
    epoch_utils.py:108-113 uses whichever the dataset declares)."""
    if metric == "mrr":
        return "mrr", 0
    if metric.startswith("hits@"):
        k = int(metric[5:])
        if k < 1:
            raise ValueError(f"hits@k needs k >= 1, got '{metric}'")
        return "hits", k
    raise ValueError(f"unsupported eval metric '{metric}'")


def rank_metric_from_counts(opt, pes, kind: str, k: int):
    """Per-event metric value from additive rank counts (device-side;
    used inside the engines' jitted finalizers).  opt = #neg strictly
    better, pes = #neg at least as good — the TGB/OGB tie convention
    rank is their midpoint + 1; hits@k and MRR are both pure functions
    of that rank, so chunked negative evaluation stays exact for both."""
    import jax.numpy as jnp

    rank = 0.5 * (opt + pes).astype(jnp.float32) + 1.0
    if kind == "mrr":
        return 1.0 / rank
    return (rank <= k).astype(jnp.float32)


def hits_at_k(y_pred_pos: np.ndarray, y_pred_neg: np.ndarray, k: int,
              neg_mask: np.ndarray | None = None) -> np.ndarray:
    """Per-event hits@k under the same tie convention as mrr()."""
    pos = y_pred_pos[:, None]
    better = y_pred_neg > pos
    at_least = y_pred_neg >= pos
    if neg_mask is not None:
        better = better & neg_mask
        at_least = at_least & neg_mask
    rank = 0.5 * (better.sum(axis=1) + at_least.sum(axis=1)) + 1.0
    return (rank <= k).astype(np.float64)


def average_precision(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """sklearn-equivalent AP (step-wise precision-recall integral)."""
    order = np.argsort(-y_score, kind="stable")
    y = y_true[order]
    tp = np.cumsum(y)
    fp = np.cumsum(1 - y)
    precision = tp / np.maximum(tp + fp, 1)
    n_pos = y.sum()
    if n_pos == 0:
        return 0.0
    # AP = sum over positives of precision at each positive hit / n_pos
    return float((precision * y).sum() / n_pos)


def roc_auc(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """Rank-based AUC (Mann-Whitney U), ties handled via midranks —
    matches sklearn.roc_auc_score."""
    n_pos = int(y_true.sum())
    n_neg = len(y_true) - n_pos
    if n_pos == 0 or n_neg == 0:
        return 0.5
    order = np.argsort(y_score, kind="stable")
    ranks = np.empty(len(y_score), dtype=np.float64)
    sorted_scores = y_score[order]
    # midranks for ties
    i = 0
    r = np.arange(1, len(y_score) + 1, dtype=np.float64)
    while i < len(y_score):
        j = i
        while j + 1 < len(y_score) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        r[i:j + 1] = 0.5 * (i + 1 + j + 1)
        i = j + 1
    ranks[order] = r
    sum_pos = ranks[y_true.astype(bool)].sum()
    return float((sum_pos - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


# ----------------------------------------------------------- device (jnp)
# Device-side metric kernels: host↔device fetches are latency-bound (on
# remote/tunneled TPU backends each D2H costs ~0.5 s), so the engine
# accumulates per-batch outputs on device and computes epoch metrics in
# ONE jitted reduction with a single scalar fetch.

def jnp_mrr(y_pred_pos, y_pred_neg, valid):
    """Per-event reciprocal rank on device; same tie convention as mrr().
    y_pred_pos (B,), y_pred_neg (B, M), valid (B,) -> (B,) with 0 at
    padded events."""
    import jax.numpy as jnp

    pos = y_pred_pos[:, None]
    opt = (y_pred_neg > pos).sum(axis=1)
    pes = (y_pred_neg >= pos).sum(axis=1)
    rank = 0.5 * (opt + pes) + 1.0
    return jnp.where(valid, 1.0 / rank, 0.0)


def jnp_ap_auc(pos_logits, neg_logits, valid):
    """Per-batch AP and rank-AUC on device via PAIRWISE counting
    (sklearn-equivalent for distinct real-valued scores; AUC uses 0.5
    tie credit — ties have measure zero for real logits).  pos/neg (B,),
    valid (B,) -> (ap, auc) scalars.

    Pairwise (B, B) broadcast-compares fuse into ~3 kernels; the
    sort-based formulation costs a sort + gathers + 3 cumsums, and every
    kernel carries a fixed dispatch overhead on remote/tunneled TPU
    runtimes (BASELINE.md) — the metric was a measurable slice of the
    train step."""
    import jax.numpy as jnp

    vf = valid.astype(jnp.float32)
    sp = pos_logits.astype(jnp.float32)
    sn = neg_logits.astype(jnp.float32)
    n_pos = vf.sum()
    vj = vf[None, :]
    # per valid positive i: tp = #valid pos_j with s_j >= s_i (incl. i),
    # fp = #valid neg_j with s_j > s_i — precision at i's threshold
    tp = ((sp[None, :] >= sp[:, None]) * vj).sum(axis=1)
    fp = ((sn[None, :] > sp[:, None]) * vj).sum(axis=1)
    precision = tp / jnp.maximum(tp + fp, 1.0)
    ap = (precision * vf).sum() / jnp.maximum(n_pos, 1.0)
    # Mann-Whitney AUC: wins + half-ties over valid (pos, neg) pairs
    wins = ((sn[None, :] < sp[:, None]) * vj).sum(axis=1)
    ties = ((sn[None, :] == sp[:, None]) * vj).sum(axis=1)
    auc = ((wins + 0.5 * ties) * vf).sum() / jnp.maximum(n_pos * n_pos,
                                                         1.0)
    return ap, auc


class Evaluator:
    """TGB-Evaluator-shaped API (reference epoch_utils.py:108-113):
    eval({'y_pred_pos', 'y_pred_neg', 'eval_metric'}) -> {metric: value}."""

    def __init__(self, name: str = ""):
        self.name = name

    def eval(self, input_dict):
        metric = input_dict["eval_metric"][0]
        pos = np.asarray(input_dict["y_pred_pos"])
        neg = np.asarray(input_dict["y_pred_neg"])
        kind, k = parse_eval_metric(metric)
        if kind == "mrr":
            return {"mrr": float(mrr(pos, neg).mean())}
        return {metric: float(hits_at_k(pos, neg, k).mean())}
