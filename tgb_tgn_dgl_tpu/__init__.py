"""tgb_tgn_dgl_tpu — a TPU-native temporal-GNN framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
``cseduashraful/tgb-tgn-dgl`` (TGN-style temporal GNNs on TGB dynamic
link-prediction datasets).  This is NOT a port: the reference's dynamic DGL
graphs, python-dict message stores and sequential sub-block loops are
re-expressed as static-shape dense grids packed on the host, so the TPU
executes one fused dense pass per batch (see ``data/packer.py`` and
``models/tgnn.py``).

Layer map (mirrors SURVEY.md §1):
  data/      L0+L1 — dataset ingestion, dependency blocking, host batch packer
  ops/       L2+L3 kernels — time encoding, segment ops, neighbor cache,
             dense edge attention (XLA + Pallas)
  models/    L3 — TGNN (flagship), TGN memory family, decoders
  engine/    L4 — train/eval loops, evaluator, metrics, checkpointing
  parallel/  NEW — mesh/sharding (stream-DP x node-state sharding)
  utils/     L7 — config (TGL 4-section schema), logging
"""

__version__ = "0.1.0"
