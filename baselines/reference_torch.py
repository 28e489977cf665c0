#!/usr/bin/env python
"""Reference-faithful torch re-execution of the reference training math.

The reference (`cseduashraful/tgb-tgn-dgl`) cannot run in this image (no
dgl/tgb packages), so this script re-executes its per-batch computation
faithfully in plain torch to produce the measured baseline recorded in
BASELINE.json["measured"].  It follows the active DGL path exactly
(SURVEY.md §3.2-3.4) on the hardware the reference would pick on this
host (`cuda if available else cpu`, reference pyg-mem-tgn.py:35):

  per batch (2000 events, reference config/TGN.yml:27):
    - 1 uniform negative per event from the destination universe
      (reference neg_sampler.py:8-23)
    - split events into dependency blocks (reference dependencyGraph.py)
    - last-K=10 recency-cache query over unique(src∪dst∪neg)
      (reference neighbor_loader.py:26-50)
    - sequential per-block forward: in-edges of the block's root nodes
      (cache ∪ self-loop ∪ earlier blocks' positive edges, reference
      model_utils.py:99,151-157), Δt Fourier time encode
      (model_utils.py:440-449), 8-head EdgeGAT with scalar messages
      (model_utils.py:565-612), residual + head mean
    - 2-tower edge predictor (model_utils.py:165-195), BCE pos+neg, Adam
    - recency-cache insert (reference epoch_utils.py:300)

This is NOT a copy of the reference code — it is the same math written
against the structural survey, with torch-native dense ops standing in
for DGL's C++ kernels (which is generous to the baseline: no DGL graph
object building overhead is charged).

Usage:  python baselines/reference_torch.py [--batches N]
prints a JSON line with events/sec; copy into BASELINE.json["measured"].
"""
import argparse
import json
import math
import sys
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

sys.path.insert(0, ".")
from tgb_tgn_dgl_tpu.data.dataset import synthetic          # noqa: E402
from tgb_tgn_dgl_tpu.data.dependency import get_block       # noqa: E402


class LastNeighborCache:
    """(N, K) most-recent-neighbor ring buffer (reference
    neighbor_loader.py:16-109): undirected insert, keep top-K by e_id."""

    def __init__(self, num_nodes, k, device):
        self.k = k
        self.nbr = torch.zeros(num_nodes, k, dtype=torch.long, device=device)
        self.eid = torch.full((num_nodes, k), -1, dtype=torch.long, device=device)
        self.t = torch.zeros(num_nodes, k, device=device)
        self.cur = 0

    def query(self, nodes):
        """Return COO in-edges (src=neighbor, dst=node) with e_id and t."""
        nbr = self.nbr[nodes]                       # (n, K)
        eid = self.eid[nodes]
        tt = self.t[nodes]
        mask = eid >= 0
        dst_idx = torch.arange(len(nodes), device=nbr.device)[:, None].expand_as(nbr)
        return (nbr[mask], nodes[dst_idx[mask]], eid[mask], tt[mask])

    def insert(self, src, dst, t):
        b = len(src)
        eid = torch.arange(self.cur, self.cur + b, device=src.device)
        self.cur += b
        nodes = torch.cat([src, dst])
        nbrs = torch.cat([dst, src])
        eids = torch.cat([eid, eid])
        tt = torch.cat([t, t])
        # merge: per node keep top-K by e_id among (existing ∪ new)
        uniq, inv = torch.unique(nodes, return_inverse=True)
        cat_n = torch.cat([self.nbr[uniq].reshape(-1),
                           torch.zeros(len(nodes), dtype=torch.long,
                                       device=src.device)])
        # scatter new entries into per-node slots: do it the simple
        # sort-based way the reference does (sort by e_id, topk)
        order = torch.argsort(eids, descending=True, stable=True)
        nodes_o, nbrs_o, eids_o, tt_o = (nodes[order], nbrs[order],
                                         eids[order], tt[order])
        # for each unique node take first K occurrences + merge with cache
        for u in uniq.tolist():
            m = nodes_o == u
            new_n = nbrs_o[m][: self.k]
            new_e = eids_o[m][: self.k]
            new_t = tt_o[m][: self.k]
            all_n = torch.cat([new_n, self.nbr[u]])
            all_e = torch.cat([new_e, self.eid[u]])
            all_t = torch.cat([new_t, self.t[u]])
            top = torch.topk(all_e, self.k).indices
            self.nbr[u], self.eid[u], self.t[u] = (all_n[top], all_e[top],
                                                   all_t[top])


class TimeEncode(nn.Module):
    """cos(w t + b), fixed TGL init (reference model_utils.py:201-237)."""

    def __init__(self, dim):
        super().__init__()
        self.w = nn.Linear(1, dim)
        w0 = 1.0 / (10 ** np.linspace(0, 9, dim, dtype=np.float32))
        self.w.weight = nn.Parameter(torch.from_numpy(w0).reshape(dim, 1))
        self.w.bias = nn.Parameter(torch.zeros(dim))

    def forward(self, t):
        return torch.cos(self.w(t.unsqueeze(-1)))


class EdgeGAT(nn.Module):
    """8-head edge-featured GAT with scalar messages, as the reference's
    EdgeGATConv computes it (model_utils.py:471-612): logits =
    leakyrelu(el + ee + er), per-dst softmax, out = sum a*(el+ee),
    identity residual, head mean."""

    def __init__(self, dim, edge_dim, heads, drop=0.6):
        super().__init__()
        self.h, self.d = heads, dim
        self.fc_node = nn.Linear(dim, heads * dim)
        self.fc_edge = nn.Linear(edge_dim, heads * dim)
        self.attn_l = nn.Parameter(torch.randn(1, heads, dim) * 0.1)
        self.attn_r = nn.Parameter(torch.randn(1, heads, dim) * 0.1)
        self.attn_e = nn.Parameter(torch.randn(1, heads, dim) * 0.1)
        self.feat_drop = nn.Dropout(drop)
        self.attn_drop = nn.Dropout(drop)

    def forward(self, x, esrc, edst, efeat, n_nodes):
        x = self.feat_drop(x)
        efeat = self.feat_drop(efeat)
        zsrc = self.fc_node(x[esrc]).view(-1, self.h, self.d)
        zdst = self.fc_node(x[edst]).view(-1, self.h, self.d)
        ze = self.fc_edge(efeat).view(-1, self.h, self.d)
        el = (zsrc * self.attn_l).sum(-1)
        er = (zdst * self.attn_r).sum(-1)
        ee = (ze * self.attn_e).sum(-1)
        el_prime = el + ee                               # (E, H)
        logits = F.leaky_relu(el_prime + er, 0.2)
        # per-destination segment softmax (DGL edge_softmax equivalent)
        a = torch.zeros_like(logits)
        mx = torch.full((n_nodes, self.h), -1e30, device=x.device)
        mx.scatter_reduce_(0, edst[:, None].expand_as(logits), logits,
                           "amax", include_self=True)
        ex = torch.exp(logits - mx[edst])
        den = torch.zeros(n_nodes, self.h, device=x.device)
        den.scatter_add_(0, edst[:, None].expand_as(ex), ex)
        a = ex / den[edst].clamp(min=1e-30)
        a = self.attn_drop(a)
        msg = a * el_prime                               # scalar messages
        out = torch.zeros(n_nodes, self.h, device=x.device)
        out.scatter_add_(0, edst[:, None].expand_as(msg), msg)
        return x + out.mean(-1, keepdim=True)            # residual+head mean


class EdgePredictor(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.src_fc = nn.Linear(dim, dim)
        self.dst_fc = nn.Linear(dim, dim)
        self.out_fc = nn.Linear(dim, 1)

    def forward(self, hs, hp, hn):
        s = self.src_fc(hs)
        return (self.out_fc(F.relu(s + self.dst_fc(hp))).squeeze(-1),
                self.out_fc(F.relu(s + self.dst_fc(hn))).squeeze(-1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--warm", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=2000)
    args = ap.parse_args()

    device = torch.device("cuda" if torch.cuda.is_available() else "cpu")
    torch.manual_seed(0)
    data = synthetic("tgbl-wiki")
    rows = np.nonzero(data.train_mask)[0]
    K, D, H = 10, 100, 8
    feats = torch.from_numpy(data.msg).to(device)
    cache = LastNeighborCache(data.num_nodes, K, device)
    time_enc = TimeEncode(D).to(device)
    gat = EdgeGAT(D, data.msg_dim + D, H).to(device)
    pred = EdgePredictor(D).to(device)
    memory = torch.ones(data.num_nodes, D, device=device)  # frozen ones
    params = (list(time_enc.parameters()) + list(gat.parameters())
              + list(pred.parameters()))
    opt = torch.optim.Adam(params, lr=1e-4)
    crit = nn.BCEWithLogitsLoss()
    dst_universe = torch.from_numpy(data.unique_dst()).to(device)
    rng = np.random.default_rng(0)

    def run_batch(lo):
        hi = min(lo + args.batch_size, len(rows))
        r = rows[lo:hi]
        src = torch.from_numpy(data.src[r].astype(np.int64)).to(device)
        dst = torch.from_numpy(data.dst[r].astype(np.int64)).to(device)
        t = torch.from_numpy(data.t[r]).to(device)
        blocks = torch.from_numpy(
            get_block(data.src[r], data.dst[r]).astype(np.int64)).to(device)
        neg = dst_universe[torch.from_numpy(
            rng.integers(0, len(dst_universe), hi - lo)).to(device)]
        opt.zero_grad()

        n_id = torch.unique(torch.cat([src, dst, neg]))
        assoc = torch.full((data.num_nodes,), -1, dtype=torch.long,
                           device=device)
        assoc[n_id] = torch.arange(len(n_id), device=device)
        # batch graph: cache in-edges of n_id + self loops, grows per block
        e_src, e_dst, e_eid, e_t = cache.query(n_id)
        ge_src = [assoc[e_src]]
        ge_dst = [assoc[e_dst]]
        ge_feat = [feats[e_eid]]
        ge_t = [e_t]
        sl = torch.arange(len(n_id), device=device)
        ge_src.append(sl); ge_dst.append(sl)
        ge_feat.append(torch.ones(len(n_id), data.msg_dim, device=device))
        ge_t.append(torch.zeros(len(n_id), device=device))

        clock = torch.zeros(data.num_nodes, device=device)
        k = int(blocks.max()) + 1
        hs, hp, hn = [], [], []
        for i in range(k):
            m = blocks == i
            s_i, p_i, n_i, t_i = src[m], dst[m], neg[m], t[m]
            clock[n_i] = t_i; clock[p_i] = t_i; clock[s_i] = t_i
            roots = torch.unique(torch.cat([s_i, p_i, n_i]))
            roots_l = assoc[roots]
            # in-subgraph: edges whose dst is a root (reference
            # dgl.in_subgraph, model_utils.py:99)
            es = torch.cat(ge_src); ed = torch.cat(ge_dst)
            ef = torch.cat(ge_feat); et = torch.cat(ge_t)
            is_root = torch.zeros(len(n_id), dtype=torch.bool, device=device)
            is_root[roots_l] = True
            sel = is_root[ed]
            es_s, ed_s, ef_s, et_s = es[sel], ed[sel], ef[sel], et[sel]
            dt = et_s - clock[n_id[es_s]]
            e_in = torch.cat([ef_s, time_enc(dt)], -1)
            emb = gat(memory[n_id], es_s, ed_s, e_in, len(n_id))
            hs.append(emb[assoc[s_i]])
            hp.append(emb[assoc[p_i]])
            hn.append(emb[assoc[n_i]])
            # grow graph with this block's positive edges, both directions
            ge_src += [assoc[s_i], assoc[p_i]]
            ge_dst += [assoc[p_i], assoc[s_i]]
            fm = feats[torch.from_numpy(r).to(device)[m]]
            ge_feat += [fm, fm]
            ge_t += [t_i, t_i]
        pos_out, neg_out = pred(torch.cat(hs), torch.cat(hp), torch.cat(hn))
        loss = crit(pos_out, torch.ones_like(pos_out)) + \
            crit(neg_out, torch.zeros_like(neg_out))
        cache.insert(src, dst, t)
        loss.backward()
        opt.step()
        return hi - lo

    # warmup
    lo = 0
    for _ in range(args.warm):
        run_batch(lo)
        lo += args.batch_size
    t0 = time.perf_counter()
    events = 0
    for _ in range(args.batches):
        events += run_batch(lo)
        lo += args.batch_size
        if lo + args.batch_size > len(rows):
            lo = 0
    secs = time.perf_counter() - t0
    print(json.dumps({
        "metric": "reference_torch_train_edges_per_sec",
        "value": round(events / secs, 1),
        "unit": "edges/s",
        "device": str(device),
        "batches": args.batches,
    }))


if __name__ == "__main__":
    main()
