"""ripor_tpu — a TPU-native generative-retrieval framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of HansiZeng/RIPOR
(arXiv 2311.09134): residual-quantization semantic DocIDs, a T5-style
encoder-decoder with per-position codebook decoder heads, trie-constrained
beam-search retrieval, and the full multi-phase training recipe — designed
for SPMD execution over TPU device meshes.

Layering (bottom-up):
  core/        mesh + sharding + precision policy + rng discipline
  models/      from-scratch T5 encoder-decoder, RIPOR docid head, encoders
  ops/         hot ops (masked top-k, scoring einsums, pallas kernels)
  parallel/    sharding rules, collectives helpers, distributed init
  quantize/    JAX k-means / residual quantization (replaces faiss)
  trie/        tensorized prefix->allowed-token tables (replaces scipy CSR)
  decode/      constrained beam search as lax.scan (pure XLA, no host syncs)
  train/       losses, train step, optimizer, checkpointing
  data/        tokenizer, dataset readers, fixed-shape collators
  evaluation/  trec-eval-compatible metrics, dense retrieval, run I/O
  pipeline/    multi-phase recipe orchestration (replaces full_scripts/*.sh)
  cli/         train / index / retrieve / eval entry points
"""

__version__ = "0.1.0"

from ripor_tpu.models.config import RiporConfig, T5Config  # noqa: F401
