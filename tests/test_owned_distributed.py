"""Cross-process owned-state exchange (DistributedOwnerExchange):
2 REAL OS processes under jax.distributed, each holding ONE node-range
shard, pack their ranges via the 2-round boundary-row collectives —
wires must equal a full-state serial pack bit-for-bit, over multiple
super-batches with evolving owner state.
"""
import os
import socket
import subprocess
import sys

_WORKER = r"""
import sys
import numpy as np

pid, port = int(sys.argv[1]), sys.argv[2]
import jax
jax.distributed.initialize(f"127.0.0.1:{port}", 2, pid)

from tgb_tgn_dgl_tpu.data.dataset import synthetic
from tgb_tgn_dgl_tpu.data.dependency import get_block
from tgb_tgn_dgl_tpu.data.packer import PackerConfig, StreamPacker
from tgb_tgn_dgl_tpu.parallel.multihost import multihost_allgather
from tgb_tgn_dgl_tpu.parallel.owned_state import (
    DistributedOwnerExchange, NodeRangeOwnedState,
    pack_with_gathered_state)

data = synthetic("owned-2proc", num_edges=900, num_nodes=140, msg_dim=4,
                 num_neg=2, seed=57)
B, K, S = 75, 5, 2
N = data.num_nodes
cfg = PackerConfig(num_neighbors=K, batch_size=B, max_intra_block=8,
                   mailbox_size=S)
serial = StreamPacker(N, cfg)       # full-state truth (local only)
scratch = StreamPacker(N, cfg)
owner = NodeRangeOwnedState(N, 2, pid, K, S)
exchange = DistributedOwnerExchange(owner, pid, 2, multihost_allgather)
rng = np.random.default_rng(3)      # same stream on both procs

rows_all = np.arange(900)
for sb in range(3):
    batches = []
    for h in range(2):
        idx = rows_all[(2 * sb + h) * B:(2 * sb + h + 1) * B]
        src, dst, t = data.src[idx], data.dst[idx], data.t[idx]
        neg = rng.integers(0, N, B).astype(np.int32)
        batches.append((src, dst, t, idx, get_block(src, dst), neg))
    # own range packed via the cross-process boundary exchange
    got, giw, xb = pack_with_gathered_state(scratch, [exchange],
                                            *batches[pid])
    assert xb > 0
    # truth: every range packs against the super-batch-start state
    snap = serial.snapshot()
    serial.restore(snap)
    want, wiw = serial.pack_wire(*batches[pid])
    assert giw == wiw, (giw, wiw)
    for f in type(want)._fields:
        a, b = getattr(want, f), getattr(got, f)
        if a is None and b is None:
            continue
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=f"sb {sb} proc {pid} field {f}")
    # advance: serial sequentially over the super-batch; owner applies
    # every batch to its shard
    serial.restore(snap)
    for b_args in batches:
        serial.pack(*b_args)
        owner.apply_batch(b_args[0], b_args[1], b_args[2], b_args[4],
                          b_args[5], e_id=b_args[3])
    # shard rows equal the serial truth after every super-batch
    sl = slice(owner.lo, owner.hi)
    np.testing.assert_array_equal(owner.cache_eid, serial.cache_eid[sl])
    np.testing.assert_array_equal(owner.clock, serial.clock[sl])
    np.testing.assert_array_equal(owner.mail_ptr, serial.mail_ptr[sl])
print(f"proc {pid} ok", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_owned_exchange(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.getcwd()
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out.decode())
    finally:
        for p in procs:
            p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} ok" in out
