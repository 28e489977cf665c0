"""Reference-lockstep torch oracle: the sequential sub-block forward.

This module re-executes the reference's active DGL path math
(/root/reference/model_utils.py:61-159 forward, :422-455 edge preprocess,
:530-612 EdgeGATConv, :165-195 predictor; /root/reference/epoch_utils.py
train/test protocol) in plain torch, *structurally as the reference does
it*: a growing COO edge list, a per-block ``in_subgraph`` (edges whose
destination is a block root), a PERSISTENT per-node clock (``time_assoc``
is a module buffer never reset, model_utils.py:22), and the sequential
block loop where block i's positive edges become message-passing edges
for blocks > i (model_utils.py:151-157).

It shares NO code or data structures with the JAX framework's packer:
the recency cache is a naive per-node python list, edges are dynamic COO,
Δt is computed inside the block loop from the live clock.  It exists to
prove that the framework's dense-grid redesign (one masked pass over a
host-packed (R, Kp) grid, models/tgnn.py + data/packer.py) computes the
SAME function as the reference's sequential loop — per-batch logits to fp
tolerance, epoch-level MRR to <0.5% (tests/test_reference_parity.py).

Deliberate deviations from the reference, both applied on OUR side too
(documented in SURVEY.md §7.5, models/tgnn.py docstring):
  * eval (src, negative) pairing is per-event (the reference's
    ``h_src.tile(M,1)`` pairs sources with other events' negatives when
    M > 1 — a bug we do not replicate on either side);
  * eval ragged negatives are served by the engine's FixedNegatives
    (rectangular in these tests, so truncate/pad is moot).
"""
from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class NaiveRecencyCache:
    """Last-K most-recent-neighbor store, one python list per node —
    independent re-implementation of reference neighbor_loader.py:52-104
    (undirected insert, keep top-K by e_id).  e_ids are global event rows
    and arrive monotonically within an epoch, so "top-K by e_id" ==
    "last K appended"."""

    def __init__(self, num_nodes: int, k: int):
        self.k = k
        self.lists = [[] for _ in range(num_nodes)]

    def reset(self):
        for lst in self.lists:
            lst.clear()

    def insert(self, src, dst, t, e_id):
        k = self.k
        for s, d, tt, e in zip(src.tolist(), dst.tolist(), t.tolist(),
                               np.asarray(e_id).tolist()):
            self.lists[s].append((e, d, tt))
            self.lists[d].append((e, s, tt))
        for n in set(src.tolist()) | set(dst.tolist()):
            if len(self.lists[n]) > k:
                del self.lists[n][:-k]


class LockstepReference:
    """Reference math, lockstep-drivable per batch with externally
    supplied negatives, weights copied from the JAX flagship params."""

    def __init__(self, data, jax_params, num_neighbors: int = 10,
                 lr: float = 1e-4):
        p = jax_params
        tw = np.asarray(p["time"]["w"], np.float32)
        D = tw.shape[0]
        attn_l = np.asarray(p["gat"]["attn_l"], np.float32)   # (H, D)
        H = attn_l.shape[0]
        F_dim = int(np.asarray(p["gat"]["fc_edge"]["w"]).shape[0]) - D
        self.D, self.H, self.F = D, H, F_dim
        self.K = num_neighbors
        self.N = data.num_nodes
        self.data = data
        self.device = torch.device("cpu")
        torch.set_grad_enabled(True)

        # --- modules (dropout 0 for determinism) -----------------------
        self.time_w = nn.Parameter(torch.from_numpy(tw.copy()))
        self.time_b = nn.Parameter(
            torch.from_numpy(np.asarray(p["time"]["b"], np.float32).copy()))

        def lin(jp):
            w = np.asarray(jp["w"], np.float32)      # (in, out)
            m = nn.Linear(w.shape[0], w.shape[1])
            with torch.no_grad():
                m.weight.copy_(torch.from_numpy(w.T.copy()))
                m.bias.copy_(torch.from_numpy(
                    np.asarray(jp["b"], np.float32).copy()))
            return m

        g = p["gat"]
        self.fc_node = lin(g["fc_node"])             # D -> H*D
        self.fc_edge = lin(g["fc_edge"])             # F+D -> H*D
        self.attn_l = nn.Parameter(torch.from_numpy(attn_l.copy())[None])
        self.attn_r = nn.Parameter(torch.from_numpy(
            np.asarray(g["attn_r"], np.float32).copy())[None])
        self.attn_e = nn.Parameter(torch.from_numpy(
            np.asarray(g["attn_e"], np.float32).copy())[None])
        pr = p["pred"]
        self.src_fc = lin(pr["src_fc"])
        self.dst_fc = lin(pr["dst_fc"])
        self.out_fc = lin(pr["out_fc"])

        params = ([self.time_w, self.time_b, self.attn_l, self.attn_r,
                   self.attn_e]
                  + list(self.fc_node.parameters())
                  + list(self.fc_edge.parameters())
                  + list(self.src_fc.parameters())
                  + list(self.dst_fc.parameters())
                  + list(self.out_fc.parameters()))
        self.opt = torch.optim.Adam(params, lr=lr)

        # --- streaming state (reference semantics) ----------------------
        self.cache = NaiveRecencyCache(self.N, num_neighbors)
        # time_assoc: persistent, NEVER reset (model_utils.py:22)
        self.clock = np.zeros(self.N, np.float32)
        self.memory = torch.ones(self.N, D)          # frozen all-ones
        self.feats = torch.from_numpy(np.asarray(data.msg, np.float32))

    # ------------------------------------------------------------- model
    def _time_encode(self, dt):
        return torch.cos(dt[:, None] * self.time_w + self.time_b)

    def _gat(self, x, esrc, edst, efeat, n_nodes):
        """EdgeGATConv scalar-message math (model_utils.py:565-612) +
        TemporalTransformerConv head mean (:693)."""
        H, D = self.H, self.D
        zsrc = self.fc_node(x[esrc]).view(-1, H, D)
        zdst = self.fc_node(x[edst]).view(-1, H, D)
        ze = self.fc_edge(efeat).view(-1, H, D)
        el = (zsrc * self.attn_l).sum(-1)            # (E, H)
        er = (zdst * self.attn_r).sum(-1)
        ee = (ze * self.attn_e).sum(-1)
        el_prime = el + ee
        logits = F.leaky_relu(el_prime + er, 0.2)
        mx = torch.full((n_nodes, H), -1e30)
        mx.scatter_reduce_(0, edst[:, None].expand_as(logits),
                           logits.detach(), "amax", include_self=True)
        ex = torch.exp(logits - mx[edst])
        den = torch.zeros(n_nodes, H)
        den.scatter_add_(0, edst[:, None].expand_as(ex), ex)
        a = ex / den[edst].clamp(min=1e-30)
        msg = a * el_prime                           # scalar messages
        out = torch.zeros(n_nodes, H)
        out.scatter_add_(0, edst[:, None].expand_as(msg), msg)
        return x + out.mean(-1, keepdim=True)        # residual + head mean

    def _predict(self, hs, hp, hn):
        s = self.src_fc(hs)
        pos = self.out_fc(F.relu(s + self.dst_fc(hp))).squeeze(-1)
        if hn.dim() == 3:
            s = s[:, None, :]
        neg = self.out_fc(F.relu(s + self.dst_fc(hn))).squeeze(-1)
        return pos, neg

    # ----------------------------------------------------------- forward
    def _forward(self, src, dst, t, ev_idx, blocks, neg2d, eval_mode):
        """The reference forward: growing edge list, sequential blocks.
        Returns (pos (B,), neg (B,) or (B, M)) in EVENT order."""
        B = len(src)
        M = neg2d.shape[1]
        n_roots = np.unique(np.concatenate([src, dst, neg2d.ravel()]))
        # graph node set = roots ∪ their cached neighbors (the loader
        # relabels over this union, neighbor_loader.py:44-50)
        nbr_set = set()
        cache_rows = {}
        for g_ in n_roots.tolist():
            rows = self.cache.lists[g_][-self.K:]
            cache_rows[g_] = rows
            for (_e, nb, _t) in rows:
                nbr_set.add(nb)
        n_id = np.unique(np.concatenate(
            [n_roots, np.fromiter(nbr_set, np.int64, len(nbr_set))])) \
            if nbr_set else n_roots.astype(np.int64)
        loc = np.full(self.N, -1, np.int64)
        loc[n_id] = np.arange(len(n_id))
        nn_ = len(n_id)

        # base edges: cache in-edges of each root + self-loops of ALL
        # graph nodes (epoch_utils.py:246-250); feats: table rows / ones
        e_src = [loc[n_id]]                  # self-loop src (local)
        e_dst = [loc[n_id]]
        e_gsrc = [n_id.astype(np.int64)]     # global src (for clock)
        e_t = [np.zeros(nn_, np.float32)]
        e_feat = [torch.ones(nn_, self.F)]
        for g_ in n_roots.tolist():
            rows = cache_rows[g_]
            if not rows:
                continue
            eids = np.array([r[0] for r in rows], np.int64)
            nbs = np.array([r[1] for r in rows], np.int64)
            tts = np.array([r[2] for r in rows], np.float32)
            e_src.append(loc[nbs])
            e_dst.append(np.full(len(rows), loc[g_], np.int64))
            e_gsrc.append(nbs)
            e_t.append(tts)
            e_feat.append(self.feats[torch.from_numpy(eids)])

        k = int(blocks.max()) + 1
        x = self.memory[torch.from_numpy(n_id)]
        pos_out = torch.zeros(B)
        neg_out = torch.zeros(B, M)
        for i in range(k):
            sel = np.nonzero(blocks == i)[0]
            ti = t[sel]
            # clock update order n → p → s (model_utils.py:77-83); eval
            # (2-D negatives) wipes every clock to the block max (:78-79)
            if eval_mode:
                self.clock[:] = ti.max()
            else:
                self.clock[neg2d[sel].ravel()] = np.repeat(ti, M)
            self.clock[dst[sel]] = ti
            self.clock[src[sel]] = ti
            roots = np.unique(np.concatenate(
                [src[sel], dst[sel], neg2d[sel].ravel()]))
            is_root = np.zeros(nn_, bool)
            is_root[loc[roots]] = True
            es = np.concatenate(e_src)
            ed = np.concatenate(e_dst)
            egs = np.concatenate(e_gsrc)
            et = np.concatenate(e_t)
            ef = torch.cat(e_feat)
            m = is_root[ed]                            # in_subgraph
            dt = torch.from_numpy(
                (et[m] - self.clock[egs[m]]).astype(np.float32))
            e_in = torch.cat([ef[torch.from_numpy(m)],
                              self._time_encode(dt)], -1)
            emb = self._gat(x, torch.from_numpy(es[m]),
                            torch.from_numpy(ed[m]), e_in, nn_)
            pos_l, neg_l = self._predict(
                emb[torch.from_numpy(loc[src[sel]])],
                emb[torch.from_numpy(loc[dst[sel]])],
                emb[torch.from_numpy(loc[neg2d[sel]])])
            pos_out[torch.from_numpy(sel)] = pos_l
            neg_out[torch.from_numpy(sel)] = neg_l
            # grow the graph with this block's positive edges, both
            # directions, feature = the event msg (model_utils.py:151-157)
            e_src += [loc[src[sel]], loc[dst[sel]]]
            e_dst += [loc[dst[sel]], loc[src[sel]]]
            e_gsrc += [src[sel].astype(np.int64), dst[sel].astype(np.int64)]
            e_t += [ti, ti]
            fm = self.feats[torch.from_numpy(ev_idx[sel])]
            e_feat += [fm, fm]
        return pos_out, (neg_out[:, 0] if M == 1 else neg_out)

    # ------------------------------------------------------------ epochs
    def reset_cache(self):
        """Train-epoch-start reset (epoch_utils.py:175); clock persists."""
        self.cache.reset()

    def train_batch(self, src, dst, t, ev_idx, blocks, neg):
        """One training step; returns (loss, pos (B,), neg (B,)) as numpy
        (logits BEFORE the Adam update, like the engine's step)."""
        src = np.asarray(src, np.int64)
        dst = np.asarray(dst, np.int64)
        t = np.asarray(t, np.float32)
        ev_idx = np.asarray(ev_idx, np.int64)
        blocks = np.asarray(blocks, np.int64)
        neg2d = np.asarray(neg, np.int64).reshape(len(src), -1)
        self.opt.zero_grad()
        pos, negl = self._forward(src, dst, t, ev_idx, blocks, neg2d,
                                  eval_mode=False)
        loss = (F.binary_cross_entropy_with_logits(
                    pos, torch.ones_like(pos))
                + F.binary_cross_entropy_with_logits(
                    negl, torch.zeros_like(negl)))
        self.cache.insert(src, dst, t, ev_idx)   # before backward (:300)
        loss.backward()
        self.opt.step()
        return (float(loss.detach()), pos.detach().numpy(),
                negl.detach().numpy())

    @torch.no_grad()
    def eval_batch(self, src, dst, t, ev_idx, blocks, neg2d):
        """Streaming-eval step (epoch_utils.py:15-165): returns the
        per-batch mean reciprocal rank (TGB/OGB tie convention) and
        advances the stream state."""
        src = np.asarray(src, np.int64)
        dst = np.asarray(dst, np.int64)
        t = np.asarray(t, np.float32)
        ev_idx = np.asarray(ev_idx, np.int64)
        blocks = np.asarray(blocks, np.int64)
        neg2d = np.asarray(neg2d, np.int64).reshape(len(src), -1)
        pos, negl = self._forward(src, dst, t, ev_idx, blocks, neg2d,
                                  eval_mode=True)
        if negl.dim() == 1:
            negl = negl[:, None]
        opt_c = (negl > pos[:, None]).sum(1).float()
        pes_c = (negl >= pos[:, None]).sum(1).float()
        rank = 0.5 * (opt_c + pes_c) + 1.0
        mrr = (1.0 / rank).mean().item()
        self.cache.insert(src, dst, t, ev_idx)    # eval inserts (:157)
        return mrr, pos.numpy(), negl.numpy()
