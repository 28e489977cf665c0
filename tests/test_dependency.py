"""Property tests for dependency-aware blocking (SURVEY.md §4):
no node twice per block; block ids strictly increase per node; exact match
with a dict-based oracle of reference dependencyGraph.py:8-28."""
import numpy as np

from tgb_tgn_dgl_tpu.data.dependency import (check_block_invariants,
                                             dependency_aware_batch,
                                             get_block)


def oracle_get_block(src, dst):
    last = {}
    out = []
    for s, d in zip(src, dst):
        b = max(last.get(int(s), -1), last.get(int(d), -1)) + 1
        out.append(b)
        last[int(s)] = b
        last[int(d)] = b
    return np.array(out)


def test_get_block_matches_oracle():
    rng = np.random.default_rng(0)
    for trial in range(5):
        src = rng.integers(0, 20, 100)
        dst = rng.integers(0, 20, 100)
        np.testing.assert_array_equal(get_block(src, dst),
                                      oracle_get_block(src, dst))


def test_block_invariants_random():
    rng = np.random.default_rng(1)
    src = rng.integers(0, 30, 500).astype(np.int32)
    dst = rng.integers(0, 30, 500).astype(np.int32)
    blocks = dependency_aware_batch(src, dst, batch_size=64)
    check_block_invariants(src, dst, blocks, 64)
    # strictly increasing per node within each batch
    for lo in range(0, 500, 64):
        hi = min(lo + 64, 500)
        seen = {}
        for i in range(lo, hi):
            for u in {int(src[i]), int(dst[i])}:  # dedupe self-edges
                if u in seen:
                    assert blocks[i] > seen[u]
                seen[u] = blocks[i]


def test_hub_node_worst_case():
    # one hub in every event -> blocks = 0..B-1 sequentially
    src = np.zeros(10, np.int32)
    dst = np.arange(1, 11, dtype=np.int32)
    blocks = dependency_aware_batch(src, dst, batch_size=10)
    np.testing.assert_array_equal(blocks, np.arange(10))


def test_batch_reset():
    # block ids reset at batch boundaries (new dict per batch,
    # dependencyGraph.py:33-49)
    src = np.zeros(8, np.int32)
    dst = np.arange(1, 9, dtype=np.int32)
    blocks = dependency_aware_batch(src, dst, batch_size=4)
    np.testing.assert_array_equal(blocks, [0, 1, 2, 3, 0, 1, 2, 3])
