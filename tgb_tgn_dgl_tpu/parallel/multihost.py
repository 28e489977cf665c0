"""Multi-host temporal-stream parallelism: edge-range partitioning with
a super-batch event-exchange protocol.

SURVEY.md §5.7/§7 phase 5: the temporal analogue of sequence parallelism
for event streams.  The reference is strictly single-process
(SURVEY.md §2.4); this subsystem defines how N hosts consume one
time-ordered stream together.

Protocol ("super-batch exchange"):

  * The stream is cut into SUPER-BATCHES of ``n_hosts * batch_size``
    events; within a super-batch, host h takes the h-th contiguous
    (time-ordered) batch-sized edge range.
  * Each host packs its range (as one normal batch) against its LOCAL
    copy of the streaming state (recency cache, clocks, mail ring
    pointers), which is exact as of the super-batch start plus its own
    range's internal updates.  Host h does NOT see hosts g != h's events
    of the SAME super-batch while packing — bounded staleness, the same
    throughput-vs-freshness trade the reference's dependency blocking
    makes inside a batch (dependencyGraph.py), one level up.  (For
    host h, ranges g < h are one-super-batch-stale history; ranges
    g > h are future events a serial packer would not have seen either.)
  * At the super-batch boundary every host all-gathers the super-batch's
    raw events + train negatives (≤ 24 bytes/event — state itself is
    NEVER shipped, because the packer state is a pure function of the
    event stream, data/packer.py module docstring) and REPLAYS the
    full super-batch in stream order: cache inserts for remote ranges
    (insert commutes — last-K-by-e_id over distinct e_ids is
    order-free), clock replay for ALL ranges in range order (own range
    included — idempotent re-write restores serial ordering), and mail
    ring-pointer advance for remote ranges.  After the exchange, every
    host's packer state is IDENTICAL to a serial packer that consumed
    the whole stream in order — exactness at super-batch boundaries is
    the protocol invariant (tests/test_multihost.py proves it against
    the serial oracle).
  * Device-side, each host feeds its range's packed wire into the global
    ("dp", "state") mesh shard it owns
    (jax.make_array_from_process_local_data); GSPMD psums gradients
    across all hosts' shards, so parameters stay replicated globally and
    the mailbox memory state is updated once, globally, per step.

The exchange piggybacks on jax's distributed runtime when present
(multihost_utils.process_allgather over DCN) and degrades to a local
no-op in single-process runs, so the same driver code runs everywhere.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Initialize jax's multi-process runtime (no-op when single).

    Returns the process id.  Call BEFORE any jax backend use; on CPU
    fleets combine with ``jax.config.update('jax_platforms', 'cpu')``
    and ``--xla_force_host_platform_device_count`` per process."""
    import jax

    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
        return jax.process_index()
    return 0


@dataclass(frozen=True)
class EdgeRange:
    """Host h's contiguous slice of one super-batch (split-row offsets)."""
    lo: int
    hi: int
    host: int


def partition_super_batch(lo: int, hi: int, n_hosts: int,
                          batch_size: int) -> List[EdgeRange]:
    """Cut super-batch rows [lo, hi) into up to n_hosts contiguous
    batch-sized ranges; earlier hosts take earlier events.  The tail
    super-batch may leave trailing hosts empty (hi == lo)."""
    out, cur = [], lo
    for h in range(n_hosts):
        nxt = min(cur + batch_size, hi)
        out.append(EdgeRange(cur, nxt, h))
        cur = nxt
    assert cur == hi, (f"super-batch [{lo},{hi}) larger than "
                       f"{n_hosts}x{batch_size}")
    return out


def _encode(src, dst, t, ev_idx, neg) -> np.ndarray:
    src = np.asarray(src, np.int64)
    if len(src) == 0:
        return np.asarray([0, 1], np.int64)
    neg2d = np.asarray(neg, np.int64).reshape(len(src), -1)
    head = np.asarray([len(src), neg2d.shape[1]], np.int64)
    return np.concatenate([
        head, src, np.asarray(dst, np.int64),
        np.asarray(ev_idx, np.int64),
        np.asarray(t, np.float64).view(np.int64),
        neg2d.ravel()])


def _decode(buf):
    buf = np.asarray(buf)
    B, M = int(buf[0]), int(buf[1])
    o = 2
    src = buf[o:o + B].astype(np.int32); o += B
    dst = buf[o:o + B].astype(np.int32); o += B
    ev_idx = buf[o:o + B]; o += B
    t = buf[o:o + B].view(np.float64).astype(np.float32); o += B
    neg = buf[o:o + B * M].reshape(B, M).astype(np.int32)
    return src, dst, t, ev_idx, neg


class SuperBatchExchanger:
    """Restores serial-stream packer state at each super-batch boundary.

    ``allgather`` is injected: a real multi-process run passes
    ``multihost_allgather`` below; tests pass a local simulator (a
    closure over all hosts' payloads)."""

    def __init__(self, packer, host: int, n_hosts: int, allgather=None):
        self.packer = packer
        self.host = host
        self.n_hosts = n_hosts
        self.allgather = allgather or (lambda payload: [payload])

    def exchange(self, src, dst, t, ev_idx, neg) -> None:
        """Called once per super-batch with THIS host's consumed range
        (already packed + inserted locally); empty arrays for an idle
        tail host."""
        parts = self.allgather(_encode(src, dst, t, ev_idx, neg))
        assert len(parts) == self.n_hosts, (
            f"expected {self.n_hosts} ranges, got {len(parts)}")
        decoded = [_decode(p) for p in parts]
        # 1. cache inserts + mail-ring advance for REMOTE ranges (both
        #    commute across ranges: insert is last-K-by-e_id over
        #    distinct e_ids; ring advance is per-node modular count)
        for h, (r_src, r_dst, r_t, r_idx, _r_neg) in enumerate(decoded):
            if h == self.host or len(r_src) == 0:
                continue
            self.packer.insert(r_src, r_dst, r_t,
                               e_id=np.asarray(r_idx, np.int64))
            self._advance_mail(r_src, r_dst)
        # 2. clocks: strict stream order, ALL ranges (own included —
        #    idempotent), per-block n→p→s writes (data/packer.py pass 2)
        for r_src, r_dst, r_t, _r_idx, r_neg in decoded:
            if len(r_src):
                self._replay_clocks(r_src, r_dst, r_t, r_neg)

    def _advance_mail(self, src, dst) -> None:
        p = self.packer
        S = p.cfg.mailbox_size if hasattr(p, "cfg") else 1
        nodes = np.concatenate([src, dst]).astype(np.int64)
        uniq, counts = np.unique(nodes, return_counts=True)
        kept = np.minimum(counts, S)
        p.mail_ptr[uniq] = (p.mail_ptr[uniq] + kept) % S

    def _replay_clocks(self, src, dst, t, neg2d) -> None:
        """Re-derive the serial clock: per dependency block (recomputed
        deterministically — the range is one batch, so get_block matches
        what the owning host packed with), write n → p → s."""
        from ..data.dependency import get_block

        clock = self.packer.clock
        blocks = get_block(src, dst)
        M = neg2d.shape[1]
        for i in range(int(blocks.max()) + 1):
            sel = np.nonzero(blocks == i)[0]
            ti = t[sel]
            clock[neg2d[sel].ravel()] = np.repeat(ti, M)
            clock[dst[sel]] = ti
            clock[src[sel]] = ti


def multihost_allgather(payload: np.ndarray) -> Sequence[np.ndarray]:
    """All-gather a 1-D int64 payload across jax processes (DCN)."""
    import jax
    from jax.experimental import multihost_utils

    n = jax.process_count()
    if n == 1:
        return [payload]
    # pad to a common max length so process_allgather sees equal shapes
    lens = multihost_utils.process_allgather(
        np.asarray([len(payload)], np.int64), tiled=False).reshape(-1)
    mx = int(lens.max())
    local = np.zeros(mx, np.int64)
    local[:len(payload)] = payload
    gathered = multihost_utils.process_allgather(local, tiled=False)
    return [np.asarray(gathered[h])[:int(lens[h])] for h in range(n)]


def make_process_global_wire(mesh, wire, stacked: bool = False):
    """Assemble a GLOBAL dp-sharded wire from per-process local shards:
    each host passes the wire for ITS edge range; the result is the
    global array whose dp-shard on this host's devices is that wire
    (jax.make_array_from_process_local_data)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(None, "dp") if stacked else P("dp")

    def put(a):
        if a is None:
            return None
        a = np.asarray(a)
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), a)

    return jax.tree.map(put, wire, is_leaf=lambda x: x is None)
