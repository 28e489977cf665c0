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


@pytest.mark.parametrize("n_hosts,mailbox,native", [
    (2, 1, False), (3, 2, False), (2, 1, True), (2, 2, True)])
def test_super_batch_exchange_matches_serial(n_hosts, mailbox, native):
    """native=True runs the protocol against the production C++ packer,
    whose clock/mail_ptr properties return COPIES — the exchanger must
    write state back through load_state, not mutate views."""
    if native:
        from tgb_tgn_dgl_tpu.data import native_packer
        if not native_packer.available():
            pytest.skip("libhostops.so not built")
        make = lambda cfg: native_packer.NativeStreamPacker(
            data.num_nodes, cfg)
    else:
        make = lambda cfg: StreamPacker(data.num_nodes, cfg)
    data = synthetic("mh", num_edges=1400, num_nodes=200, msg_dim=4,
                     num_neg=4, seed=9)
    B = 100
    rows = np.nonzero(data.train_mask)[0]
    cfg = PackerConfig(num_neighbors=5, batch_size=B,
                       mailbox_size=mailbox)
    serial = make(cfg)
    hosts = [make(cfg) for _ in range(n_hosts)]
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


def test_composed_super_batch_step_matches_per_host_math():
    """offset_wire_for_host + concat_offset_wires compose per-host wires
    into ONE global frozen-memory training step: its loss and gradients
    must equal the average of the per-host losses/gradients computed
    independently (equal-sized full batches -> plain mean), proving the
    slot/loc/trash-row rebasing is exact."""
    import jax
    import jax.numpy as jnp

    from tgb_tgn_dgl_tpu.models.tgnn import (TGNNConfig, bce_loss,
                                             init_tgnn, tgnn_forward)
    from tgb_tgn_dgl_tpu.ops.wire import expand_wire
    from tgb_tgn_dgl_tpu.parallel import mesh as mesh_lib
    from tgb_tgn_dgl_tpu.parallel.multihost import concat_offset_wires

    data = synthetic("mh-step", num_edges=900, num_nodes=150, msg_dim=6,
                     num_neg=4, seed=21)
    B, K, IW = 64, 5, 8
    rows = np.nonzero(data.train_mask)[0]
    cfg = PackerConfig(num_neighbors=K, batch_size=B, max_intra_block=IW,
                       root_bucket_lo=512)   # equal buckets across hosts
    hosts = [StreamPacker(data.num_nodes, cfg) for _ in range(2)]
    neg_sampler = NegLinkSamplerDest(data.unique_dst(), seed=5)

    model_cfg = TGNNConfig(edge_feat_dim=data.msg_dim, hidden_dim=16,
                           num_heads=2, feat_drop=0.0, attn_drop=0.0)
    params = init_tgnn(jax.random.PRNGKey(0), model_cfg)
    memory = jnp.ones((data.num_nodes, 16), jnp.float32)
    feats = jnp.asarray(data.msg)
    N = data.num_nodes

    def loss_fn(p, wire):
        pack = expand_wire(wire, K, IW, N)
        pos, neg = tgnn_forward(p, model_cfg, memory, feats, pack,
                                train=False)
        return bce_loss(pos, neg, pack.ev_valid)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    for sb in range(2):
        wires, losses, grads, batches = [], [], [], []
        for h in range(2):
            lo = (2 * sb + h) * B
            idx = rows[lo:lo + B]
            src, dst, t = data.src[idx], data.dst[idx], data.t[idx]
            neg = neg_sampler.sample(dst)
            batches.append((src, dst, t, idx, neg))
            w, _ = hosts[h].pack_wire(src, dst, t, idx,
                                      get_block(src, dst), neg)
            wires.append(w)
            l, g = grad_fn(params, w)
            losses.append(float(l))
            grads.append(g)
        assert wires[0].root_loc.shape == wires[1].root_loc.shape
        gw = concat_offset_wires(wires)
        gl, gg = grad_fn(params, gw)
        np.testing.assert_allclose(float(gl),
                                   0.5 * (losses[0] + losses[1]),
                                   rtol=1e-5)
        want = jax.tree.map(lambda a, b: 0.5 * (a + b), *grads)
        for a, b in zip(jax.tree.leaves(gg), jax.tree.leaves(want)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)
        # protocol: exchange so the next super-batch starts exact
        payloads = [_encode(*b) for b in batches]
        for h in range(2):
            SuperBatchExchanger(hosts[h], h, 2,
                                allgather=lambda _p: payloads
                                ).exchange(*batches[h])


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
    # 3. end-to-end composed super-batch forward: each process packs ITS
    #    edge range, offsets its wire, contributes its dp shard; the
    #    global loss must equal the locally-computed mean of per-host
    #    losses (every proc holds the full synthetic data, so it can
    #    check the answer independently).
    import jax.numpy as jnp
    from tgb_tgn_dgl_tpu.data.dataset import synthetic
    from tgb_tgn_dgl_tpu.data.dependency import get_block
    from tgb_tgn_dgl_tpu.data.packer import PackerConfig, StreamPacker
    from tgb_tgn_dgl_tpu.engine.negatives import NegLinkSamplerDest
    from tgb_tgn_dgl_tpu.models.tgnn import (TGNNConfig, bce_loss,
                                             init_tgnn, tgnn_forward)
    from tgb_tgn_dgl_tpu.ops.wire import expand_wire
    from tgb_tgn_dgl_tpu.parallel.multihost import (align_wires,
                                                    offset_wire_for_host)
    data = synthetic("mh-2proc", num_edges=600, num_nodes=120, msg_dim=4,
                     num_neg=2, seed=33)
    B, K, IW = 64, 5, 8
    rows = np.nonzero(data.train_mask)[0]
    cfg = PackerConfig(num_neighbors=K, batch_size=B, max_intra_block=IW,
                       root_bucket_lo=512)
    model_cfg = TGNNConfig(edge_feat_dim=data.msg_dim, hidden_dim=16,
                           num_heads=2, feat_drop=0.0, attn_drop=0.0)
    params = init_tgnn(jax.random.PRNGKey(0), model_cfg)
    memory = jnp.ones((data.num_nodes, 16), jnp.float32)
    feats = jnp.asarray(data.msg)
    N = data.num_nodes
    neg_sampler = NegLinkSamplerDest(data.unique_dst(), seed=5)
    # deterministic: both procs derive BOTH hosts' batches + wires, but
    # contribute only their own shard to the global array
    wires, ref_losses = [], []
    def loss_fn(p, wire):
        pack = expand_wire(wire, K, IW, N)
        pos, neg = tgnn_forward(p, model_cfg, memory, feats, pack,
                                train=False)
        return bce_loss(pos, neg, pack.ev_valid)
    for h in range(2):
        idx = rows[h * B:(h + 1) * B]
        src, dst, t = data.src[idx], data.dst[idx], data.t[idx]
        neg = neg_sampler.sample(dst)
        packer = StreamPacker(data.num_nodes, cfg)
        w, _ = packer.pack_wire(src, dst, t, idx, get_block(src, dst),
                                neg)
        wires.append(w)
        ref_losses.append(float(jax.jit(loss_fn)(params, w)))
    wires = [offset_wire_for_host(w, h, 2)
             for h, w in enumerate(align_wires(wires))]
    gwire = make_process_global_wire(mesh, wires[pid])
    gl = jax.jit(loss_fn, out_shardings=NamedSharding(mesh, P()))(
        params, gwire)
    want = 0.5 * (ref_losses[0] + ref_losses[1])
    assert abs(float(gl) - want) < 1e-5, (float(gl), want)
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
