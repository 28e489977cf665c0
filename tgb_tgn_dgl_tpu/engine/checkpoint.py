"""Checkpoint / resume + early stopping.

Capability parity with reference modules/early_stopping.py (patience
monitor with best-checkpoint save/load, :10-89) and the memory
backup/restore API (reference model_utils.py:290-308), neither of which
the reference actually wires into its driver (SURVEY.md §5.4).  Here both
are first-class: a checkpoint captures the FULL training pytree —
params, optimizer state, device memory state, the host stream-packer
state (neighbor cache, clocks, mailbox pointers, event cursor) and the
epoch/step cursors — so a run resumes deterministically (SURVEY.md §5.3:
multi-host failure recovery = restart from checkpoint).

Format: a single .npz of flattened pytree leaves (dependency-light, no
orbax requirement); the restoring side supplies the template pytree.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_pytree(path: str, tree) -> None:
    np.savez_compressed(path, **_flatten(tree))


def load_pytree(path: str, template):
    """Load leaves saved by save_pytree back into template's structure."""
    z = np.load(path, allow_pickle=False)
    flat_t = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for p, leaf in flat_t[0]:
        key = "/".join(str(q) for q in p)
        if key not in z:
            raise KeyError(f"checkpoint missing leaf '{key}'")
        a = z[key]
        if hasattr(leaf, "dtype") and a.shape != np.shape(leaf):
            raise ValueError(
                f"shape mismatch for '{key}': ckpt {a.shape} vs "
                f"template {np.shape(leaf)}")
        leaves.append(a)
    return jax.tree_util.tree_unflatten(flat_t[1], leaves)


def rng_state_to_array(rng: np.random.Generator) -> np.ndarray:
    """Serialize a numpy PCG64 Generator state to a plain uint64 array
    (state/inc are 128-bit → hi/lo pairs, plus the uint32 cache)."""
    s = rng.bit_generator.state
    assert s["bit_generator"] == "PCG64", s["bit_generator"]
    st, inc = s["state"]["state"], s["state"]["inc"]
    mask = (1 << 64) - 1
    return np.array([st >> 64, st & mask, inc >> 64, inc & mask,
                     s["has_uint32"], s["uinteger"]], dtype=np.uint64)


def rng_state_from_array(a: np.ndarray) -> np.random.Generator:
    a = [int(x) for x in np.asarray(a, np.uint64)]
    rng = np.random.default_rng(0)
    rng.bit_generator.state = {
        "bit_generator": "PCG64",
        "state": {"state": (a[0] << 64) | a[1], "inc": (a[2] << 64) | a[3]},
        "has_uint32": a[4],
        "uinteger": a[5],
    }
    return rng


class EarlyStopMonitor:
    """Patience-based early stopping (reference
    modules/early_stopping.py:10-63 semantics): improvement = relative
    gain over the best seen so far beyond `tolerance`; stop after
    `max_round` consecutive non-improvements."""

    def __init__(self, max_round: int = 5, higher_better: bool = True,
                 tolerance: float = 1e-10, save_dir: Optional[str] = None,
                 name: str = "model"):
        self.max_round = max_round
        self.higher_better = higher_better
        self.tolerance = tolerance
        self.save_dir = save_dir
        self.name = name
        self.num_round = 0
        self.epoch_count = 0
        self.best_epoch = 0
        self.last_best: Optional[float] = None

    @property
    def best_path(self) -> Optional[str]:
        if self.save_dir is None:
            return None
        return os.path.join(self.save_dir, f"{self.name}_best.npz")

    def step_check(self, curr_val: float, state=None) -> bool:
        """Returns True when training should STOP.  If `state` is given
        and this epoch is the best so far, it is checkpointed."""
        val = curr_val if self.higher_better else -curr_val
        improved = (self.last_best is None
                    or (val - self.last_best) / abs(self.last_best
                                                    if self.last_best
                                                    else 1.0)
                    > self.tolerance)
        self.epoch_count += 1
        if improved:
            self.last_best = val
            self.num_round = 0
            self.best_epoch = self.epoch_count
            if state is not None and self.best_path is not None:
                os.makedirs(self.save_dir, exist_ok=True)
                save_pytree(self.best_path, state)
        else:
            self.num_round += 1
        return self.num_round >= self.max_round

    def load_best(self, template):
        assert self.best_path and os.path.exists(self.best_path), \
            "no best checkpoint saved"
        return load_pytree(self.best_path, template)
