"""Full-corpus-scale proof for the DocID trie (VERDICT r1 missing #4).

The reference operates on MS MARCO's 8.8M passages (its mmap store is
27 GB: /root/reference/t5_pretrainer/tasks/evaluator.py:406-421) while
round 1 validated the trie only at 100k docs. This tool builds the trie at
reference scale from synthetic RQ-like codes (shared narrow prefixes at
the early levels, uniform tails — same generator family as bench.py) and
reports the numbers that decide whether beam-1000 decode still fits one
v5e chip:

  * native build wall time (C++ builder, native/ripor_native.cc)
  * succinct-table device bytes per component (bits / node_base /
    edge_child / unique_codes)
  * int8 KV-cache HBM at the headline decode config, and the headroom sum

Run:  python tools/bench_trie_scale.py          (host-only, no TPU needed)
Env:  TRIE_DOCS (8_800_000), TRIE_M (32), TRIE_K (256)

The on-chip throughput companion is `BENCH_DOCS=8800000 python bench.py`.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import numpy as np


def synth_codes(n_docs: int, M: int, K: int, seed: int = 0) -> np.ndarray:
    """RQ-like synthetic codes: narrow early levels (cluster structure ->
    heavy prefix sharing), uniform tails (residuals decorrelate). Matches
    bench.py's generator so the host proof and the on-chip bench agree."""
    rng = np.random.default_rng(seed)
    return np.concatenate([
        rng.integers(0, max(K // 4, 2), (n_docs, 4)),
        rng.integers(0, K, (n_docs, M - 4)),
    ], axis=1).astype(np.int32)


def main():
    from ripor_tpu.trie import build_trie, succinct_tables
    n_docs = int(os.environ.get("TRIE_DOCS", 8_800_000))
    M = int(os.environ.get("TRIE_M", 32))
    K = int(os.environ.get("TRIE_K", 256))

    t0 = time.time()
    codes = synth_codes(n_docs, M, K)
    t_gen = time.time() - t0
    print(f"# codes {codes.shape} generated in {t_gen:.1f}s", file=sys.stderr)

    t0 = time.time()
    trie = build_trie(codes, K)          # native C++ path above 200k docs
    t_build = time.time() - t0
    print(f"# trie build {t_build:.1f}s: {trie.num_internal} internal "
          f"nodes, {trie.num_groups} groups, dense children "
          f"{trie.children.nbytes/1e9:.2f} GB host-transient",
          file=sys.stderr)

    t0 = time.time()
    tables = succinct_tables(trie)
    t_succ = time.time() - t0
    comp = {
        "bits_mb": tables.bits.nbytes / 1e6,
        "node_base_mb": tables.node_base.nbytes / 1e6,
        "edge_child_mb": tables.edge_child.nbytes / 1e6,
        "unique_codes_mb": tables.unique_codes.nbytes / 1e6,
    }
    total_mb = sum(comp.values())
    print(f"# succinct tables {t_succ:.1f}s: " +
          ", ".join(f"{k}={v:.0f}" for k, v in comp.items()) +
          f" -> total {total_mb:.0f} MB device", file=sys.stderr)

    # headline decode HBM budget (t5-base, beam 1000 padded to 1024,
    # batch 8, int8 rows 2F+128): TWO ping-pong cache buffers + tables
    L, F, Mc, B, Npad = 12, 768, 40, 8, 1024
    cache_gb = 2 * L * B * Npad * Mc * (2 * F + 128) / 1e9
    print(f"# int8 decode cache (2 buffers, b{B}/beam1024): "
          f"{cache_gb:.2f} GB; tables {total_mb/1000:.2f} GB; "
          f"sum {cache_gb + total_mb/1000:.2f} GB of 16 GB HBM",
          file=sys.stderr)

    print(json.dumps({
        "metric": "trie_build_seconds_8p8M",
        "value": round(t_build, 2),
        "unit": f"s@{n_docs}docs_{M}x{K}",
        "tables_mb": round(total_mb, 1),
        "internal_nodes": int(trie.num_internal),
        "groups": int(trie.num_groups),
    }))


if __name__ == "__main__":
    main()
