"""Multi-host temporal-stream parallelism (parallel/multihost.py).

1. Protocol exactness: N simulated hosts pack disjoint contiguous edge
   ranges of each super-batch against their local state, then run the
   super-batch exchange — after every exchange, each host's packer state
   (cache, clocks, mail ring pointers, e_id cursor) must be IDENTICAL to
   a serial packer that consumed the whole stream in order.
2. Real multi-process plumbing: two OS processes under
   jax.distributed (CPU backend) all-gather exchange payloads over the
   coordinator and assemble a process-global dp-sharded array.
"""
import os
import subprocess
import socket
import sys
import textwrap

import numpy as np
import pytest

from tgb_tgn_dgl_tpu.data.dataset import synthetic
from tgb_tgn_dgl_tpu.data.dependency import get_block
from tgb_tgn_dgl_tpu.data.packer import PackerConfig, StreamPacker
from tgb_tgn_dgl_tpu.engine.negatives import NegLinkSamplerDest
from tgb_tgn_dgl_tpu.parallel.multihost import (SuperBatchExchanger,
                                                _encode,
                                                partition_super_batch)


@pytest.mark.parametrize("n_hosts,mailbox", [(2, 1), (3, 2)])
def test_super_batch_exchange_matches_serial(n_hosts, mailbox):
    data = synthetic("mh", num_edges=1400, num_nodes=200, msg_dim=4,
                     num_neg=4, seed=9)
    B = 100
    rows = np.nonzero(data.train_mask)[0]
    cfg = PackerConfig(num_neighbors=5, batch_size=B,
                       mailbox_size=mailbox)
    serial = StreamPacker(data.num_nodes, cfg)
    hosts = [StreamPacker(data.num_nodes, cfg) for _ in range(n_hosts)]
    neg_sampler = NegLinkSamplerDest(data.unique_dst(), seed=3)

    sb = n_hosts * B
    for lo in range(0, len(rows), sb):
        hi = min(lo + sb, len(rows))
        ranges = partition_super_batch(lo, hi, n_hosts, B)
        batches = []
        for r in ranges:
            idx = rows[r.lo:r.hi]
            src, dst, t = data.src[idx], data.dst[idx], data.t[idx]
            neg = (neg_sampler.sample(dst) if len(idx)
                   else np.zeros(0, np.int32))
            batches.append((src, dst, t, idx, neg))
        # hosts pack their own range in parallel (against super-batch-
        # start state); serial packs everything in stream order
        for r, (src, dst, t, idx, neg) in zip(ranges, batches):
            if len(idx) == 0:
                continue
            blk = get_block(src, dst)
            hosts[r.host].pack(src, dst, t, idx, blk, neg)
            serial.pack(src, dst, t, idx, blk, neg)
        payloads = [_encode(*b) for b in batches]
        for h in range(n_hosts):
            ex = SuperBatchExchanger(hosts[h], h, n_hosts,
                                     allgather=lambda _p: payloads)
            ex.exchange(*batches[h])
        # invariant: every host's state == the serial packer's state
        for h in range(n_hosts):
            np.testing.assert_array_equal(hosts[h].cache_eid,
                                          serial.cache_eid), h
            np.testing.assert_array_equal(hosts[h].cache_nbr,
                                          serial.cache_nbr)
            np.testing.assert_array_equal(hosts[h].cache_t,
                                          serial.cache_t)
            np.testing.assert_array_equal(hosts[h].clock, serial.clock)
            np.testing.assert_array_equal(hosts[h].mail_ptr,
                                          serial.mail_ptr)
            assert hosts[h].cur_e_id == serial.cur_e_id


_WORKER = textwrap.dedent("""
    import os, sys
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); port = sys.argv[2]
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from tgb_tgn_dgl_tpu.parallel.multihost import (multihost_allgather,
                                                    make_process_global_wire)
    # 1. ragged allgather over the coordinator
    payload = np.arange(3 + 2 * pid, dtype=np.int64) + 10 * pid
    parts = multihost_allgather(payload)
    assert len(parts) == 2
    assert parts[0].tolist() == [0, 1, 2]
    assert parts[1].tolist() == [10, 11, 12, 13, 14]
    # 2. process-global dp-sharded array from per-process local shards
    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 1), ("dp", "state"))
    local = np.full((4, 3), pid, np.float32)
    import collections
    W = collections.namedtuple("W", ["a"])
    g = make_process_global_wire(mesh, W(a=local))
    total = jax.jit(lambda x: x.sum(),
                    out_shardings=NamedSharding(mesh, P()))(g.a)
    assert float(total) == 12.0, float(total)   # 0*12 + 1*12
    print(f"proc {pid} ok", flush=True)
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_distributed_cpu(tmp_path):
    """Real jax.distributed across 2 OS processes (CPU backend): the
    exchange allgather and the process-global wire assembly both work
    over the coordinator."""
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
