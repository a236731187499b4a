"""Ablation benchmark for the constrained-beam decode loop.

Times the REAL beam-search jit (bench.py config) with individual components
stubbed out, attributing the per-step budget by difference. Isolated-kernel
micro-benchmarks are meaningless through the axon relay (kernel outputs that
are not consumed by the aliased ping-pong loop get copied at ~1 GB/s), so
ablation on the intact loop is the only trustworthy attribution.

Variants:
  full          baseline (same program as bench.py)
  unconstrained no trie mask/child gathers
  approx_topk   lax.approx_max_k instead of exact top_k
  no_reorder    _reorder_cache returns the cache untouched
  no_attn       step_attention_fused replaced by identity on q
  one_segment   cache_segments=1 (full-size cache from step 0)

Run on the real chip: python tools/bench_decode_ablate.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    import numpy as np

    import ripor_tpu.decode.beam as beam_mod
    from ripor_tpu.models import RiporModel, ripor_base
    from ripor_tpu.trie import build_trie, succinct_tables

    n_docs = int(os.environ.get("BENCH_DOCS", 100_000))
    num_beams = int(os.environ.get("BENCH_BEAMS", 1000))
    batch = int(os.environ.get("BENCH_BATCH", 1))
    seq_len = int(os.environ.get("BENCH_SEQ", 64))
    iters = int(os.environ.get("BENCH_ITERS", 4))
    only = os.environ.get("BENCH_ABLATE", "").split(",") if \
        os.environ.get("BENCH_ABLATE") else None

    cfg = ripor_base(M=32, K=256)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 32000, (batch, seq_len)), jnp.int32)
    mask = jnp.ones_like(ids)
    model = RiporModel(cfg, dtype=jnp.bfloat16)
    codes0 = jnp.zeros((batch, cfg.M), jnp.int32)
    t0 = time.time()
    shapes = jax.eval_shape(
        lambda k: model.init({"params": k}, ids, mask, codes0)["params"],
        jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda s: jnp.asarray(0.02 * rng.standard_normal(s.shape), s.dtype),
        shapes)
    print(f"# params init {time.time()-t0:.1f}s", flush=True)
    doc_codes = np.concatenate([
        rng.integers(0, 64, (n_docs, 4)),
        rng.integers(0, 256, (n_docs, cfg.M - 4)),
    ], axis=1).astype(np.int32)
    trie = build_trie(doc_codes, cfg.K)
    tables = jax.tree.map(jnp.asarray, succinct_tables(trie))

    import ripor_tpu.models.t5 as t5_mod
    import ripor_tpu.ops.attend_reorder as ar_mod
    import ripor_tpu.ops.step_attention as sa_mod
    real_attn = sa_mod.step_attention_fused
    real_kernel = sa_mod._fused_kernel
    real_reorder = beam_mod._reorder_cache
    real_topk = jax.lax.top_k
    real_sar = ar_mod.step_attend_reorder
    real_chunk = ar_mod.CHUNK

    def run_variant(name, constrained=True, segments=4, attn=None,
                    reorder=None, topk=None, kernel=None, sar=None,
                    chunk=None, deferred=None, bgr=None, finish=None,
                    ar_math=None, megarow=False, mr_reorder=None,
                    mr_attn=None, mr_math=None, mr_quant4=None,
                    mr_dma_stub=False, mr_chunk=None):
        import ripor_tpu.ops.beam_gather as bg_mod
        from ripor_tpu.models.t5 import DecoderLayer
        sa_mod.step_attention_fused = attn or real_attn
        t5_mod.step_attention_fused = attn or real_attn  # if imported there
        beam_mod._reorder_cache = reorder or real_reorder
        sa_mod._fused_kernel = kernel or real_kernel
        ar_mod.step_attend_reorder = sar or real_sar
        ar_mod.CHUNK = chunk or real_chunk
        bg_mod.beam_gather_rows = bgr or real_bgr
        DecoderLayer.step_finish_with_attn = finish or real_finish
        ar_mod._attn_math_q8 = ar_math or real_math_q8
        ar_mod._attn_math = ar_math or real_math
        mr_mod.reorder_cache_all = mr_reorder or real_mr_reorder
        mr_mod.step_attention_seq = mr_attn or real_mr_attn
        mr_mod._seq_math = mr_math or real_seq_math
        mr_mod._seq_math_quant = mr_math or real_seq_math_q
        mr_mod._quantize_rows_int4 = mr_quant4 or real_mr_q4
        mr_mod._DMA_STUB = mr_dma_stub
        mr_mod.REORDER_CHUNK = mr_chunk or real_mr_chunk
        if topk is not None:
            jax.lax.top_k = topk
        jax.clear_caches()  # step_attention_fused is @jit: force a retrace
        try:
            quant = os.environ.get(
                "BENCH_ABLATE_QUANT",
                "int8" if os.environ.get("BENCH_ABLATE_INT8") == "1"
                else "")
            fn = beam_mod.make_beam_search_fn(
                cfg, num_beams, constrained=constrained,
                dtype=jnp.bfloat16, cache_segments=segments,
                deferred=deferred, kv_cache_quant=quant or None,
                megarow=megarow)
            t0 = time.time()
            s, c, st = fn(params, ids, mask, tables)
            np.asarray(s)
            compile_s = time.time() - t0
            best = float("inf")
            for _ in range(iters):
                t0 = time.time()
                s, c, st = fn(params, ids, mask, tables)
                np.asarray(s), np.asarray(st)
                best = min(best, time.time() - t0)
            print(f"{name:16s} {best*1e3:8.1f} ms/batch "
                  f"({best/32*1e3:6.2f} ms/step)  compile {compile_s:.0f}s",
                  flush=True)
            return best
        finally:
            sa_mod.step_attention_fused = real_attn
            t5_mod.step_attention_fused = real_attn
            beam_mod._reorder_cache = real_reorder
            sa_mod._fused_kernel = real_kernel
            ar_mod.step_attend_reorder = real_sar
            ar_mod.CHUNK = real_chunk
            ar_mod._attn_math_q8 = real_math_q8
            ar_mod._attn_math = real_math
            bg_mod.beam_gather_rows = real_bgr
            DecoderLayer.step_finish_with_attn = real_finish
            mr_mod.reorder_cache_all = real_mr_reorder
            mr_mod.step_attention_seq = real_mr_attn
            mr_mod._seq_math = real_seq_math
            mr_mod._seq_math_quant = real_seq_math_q
            mr_mod._quantize_rows_int4 = real_mr_q4
            mr_mod._DMA_STUB = False
            mr_mod.REORDER_CHUNK = real_mr_chunk
            jax.lax.top_k = real_topk

    def fake_attn(q, k_new, v_new, cache, layer, bias_hist, bias_new,
                  num_heads, **kw):
        return q

    def fake_reorder(cache, src_beam, use_pallas=True, kv_new=None, t=None,
                     dest=None):
        return cache

    def approx_topk(x, k):
        return jax.lax.approx_max_k(x, k)

    import jax.numpy as jnpk

    def dma_only_kernel(l_ref, q_ref, knew_ref, vnew_ref, bias_hist_ref,
                        bias_new_ref, k_ref, v_ref, out_ref, *, num_heads):
        # same operands/blocks (same DMA traffic), near-zero compute:
        # out = q + reductions of the streamed K/V blocks
        red = (k_ref[0, 0, 0].astype(jnpk.float32).sum(axis=1)
               + v_ref[0, 0, 0].astype(jnpk.float32).sum(axis=1))
        out_ref[0] = (q_ref[0].astype(jnpk.float32)
                      + red * 1e-6).astype(out_ref.dtype)

    def scores_only_kernel(l_ref, q_ref, knew_ref, vnew_ref, bias_hist_ref,
                           bias_new_ref, k_ref, v_ref, out_ref, *,
                           num_heads):
        # full score branch (kq mult + mask dot + softmax) but skip the
        # pe/V output branch
        import jax as j
        C, F = q_ref.shape[1], q_ref.shape[2]
        Mc = k_ref.shape[4]
        H = num_heads
        q32 = q_ref[0].astype(jnpk.float32)
        head_of = j.lax.broadcasted_iota(jnpk.int32, (F, H), 0) // (F // H)
        head_mask = (head_of == j.lax.broadcasted_iota(jnpk.int32, (F, H), 1))
        hm = head_mask.astype(jnpk.bfloat16)
        kq = (k_ref[0, 0, 0].astype(jnpk.float32)
              * q32[:, None, :]).reshape(C * Mc, F)
        s_hist = j.lax.dot(kq.astype(jnpk.bfloat16), hm,
                           preferred_element_type=jnpk.float32).reshape(C, Mc, H)
        s_hist = s_hist + bias_hist_ref[...].astype(jnpk.float32)[None]
        probs = j.nn.softmax(s_hist, axis=1)
        red = v_ref[0, 0, 0].astype(jnpk.float32).sum(axis=1)
        out_ref[0] = (q32 + probs.sum(axis=(1, 2))[:, None] * 1e-6
                      + red * 1e-6).astype(out_ref.dtype)

    def fake_sar(q, kv_new, kvg, cache_src, cache_dst, src, layer, t,
                 bias_hist, bias_new, num_heads, write_back=True,
                 interpret=None, chunk=None):
        return q, cache_dst

    import ripor_tpu.ops.beam_gather as bg_mod
    import ripor_tpu.ops.megarow as mr_mod
    real_bgr = bg_mod.beam_gather_rows
    from ripor_tpu.models.t5 import DecoderLayer
    real_finish = DecoderLayer.step_finish_with_attn
    real_math_q8 = ar_mod._attn_math_q8
    real_math = ar_mod._attn_math
    real_mr_reorder = mr_mod.reorder_cache_all
    real_mr_attn = mr_mod.step_attention_seq
    real_seq_math = mr_mod._seq_math
    real_seq_math_q = mr_mod._seq_math_quant
    real_mr_q4 = mr_mod._quantize_rows_int4
    real_mr_chunk = mr_mod.REORDER_CHUNK

    def fake_mr_reorder(kvg, cache_src, cache_dst, src, t, num_heads, **kw):
        return cache_dst  # skip kernel A entirely (wrong data, same shapes)

    def fake_mr_attn(q, kv_new, cache, layer, bias_hist, bias_new,
                     num_heads, **kw):
        # skip kernel B entirely; under QFUSE the call site expects the
        # extra quantized-row output (zeros keep shapes/dtypes identical)
        if kw.get("emit_quant"):
            B, N = q.shape[:2]
            return q, jnpk.zeros((B, N, cache.shape[-1]), jnpk.int8)
        return q

    def stub_seq_math(qb, kvnew, bias_hist, bias_new, rows,
                      num_heads, quant=None):
        # keep kernel B's row DMAs, skip its attention math
        red = rows[:, 0, :qb.shape[1]].astype(jnpk.float32)
        return qb.astype(jnpk.float32) + red * 1e-6

    def stub_q4(x, num_heads):
        # skip kernel A's in-VMEM quantize compute (insert garbage zeros)
        C, F2 = x.shape
        from ripor_tpu.ops.attend_reorder import SCALE_COLS
        return (jnpk.zeros((C, F2 // 2), jnpk.int8),
                jnpk.zeros((C, SCALE_COLS), jnpk.int8))

    def stub_math(q_ref, kvnew_ref, kvg_ref, bias_hist_ref, bias_new_ref,
                  buf, t, num_heads):
        # keep the row DMAs + insert/writeback but skip the attention math
        # (touch one slot so the reads cannot be elided; multi-axis sums of
        # the 3-D buf crash Mosaic layout inference)
        red = buf[...][:, 0, :q_ref.shape[2]].astype(jnpk.float32)
        return q_ref[0].astype(jnpk.float32) + red * 1e-6

    def fake_bgr(cache, src, interpret=None):
        return cache  # skip the kvg permute (wrong results, same shapes)

    def fake_finish(self, x, attn_flat, enc_k, enc_v, enc_bias, ffn_q=None):
        return x + attn_flat.astype(x.dtype) * 1e-6  # skip cross-attn + FFN

    def no_writeback_sar(q, kv_new, kvg, cache_src, cache_dst, src, layer,
                         t, bias_hist, bias_new, num_heads, write_back=True,
                         interpret=None, chunk=None):
        return real_sar(q, kv_new, kvg, cache_src, cache_dst, src, layer, t,
                        bias_hist, bias_new, num_heads,
                        write_back=False, interpret=interpret, chunk=chunk)

    variants = [
        ("full", dict()),
        ("unconstrained", dict(constrained=False)),
        ("approx_topk", dict(topk=approx_topk)),
        ("no_reorder", dict(reorder=fake_reorder)),
        ("no_attn", dict(attn=fake_attn)),
        ("one_segment", dict(segments=1)),
        ("attn_dma_only", dict(kernel=dma_only_kernel)),
        ("attn_scores_only", dict(kernel=scores_only_kernel)),
        ("def_no_kernel", dict(sar=fake_sar)),
        ("def_no_writeback", dict(sar=no_writeback_sar)),
        ("def_chunk24", dict(chunk=24)),
        ("def_chunk56", dict(chunk=56)),
        ("def_chunk80", dict(chunk=80)),
        ("non_deferred", dict(deferred=False)),
        ("def_no_kvgather", dict(bgr=fake_bgr)),
        ("def_no_ffn", dict(finish=fake_finish)),
        ("def_math_stub", dict(ar_math=stub_math)),
        # megarow path (ops/megarow.py) attribution
        ("mr_full", dict(megarow=True)),
        ("mr_no_reorder", dict(megarow=True, mr_reorder=fake_mr_reorder)),
        ("mr_no_attn", dict(megarow=True, mr_attn=fake_mr_attn)),
        ("mr_math_stub", dict(megarow=True, mr_math=stub_seq_math)),
        ("mr_quant_stub", dict(megarow=True, mr_quant4=stub_q4)),
        # kernel B with full math but ~28x fewer read bytes: distinguishes
        # "math serialized after DMA" (time ~= mr_full - dma bytes) from
        # "math already overlapped, DMA hidden under it" (time ~= mr_full)
        ("mr_dma_stub", dict(megarow=True, mr_dma_stub=True)),
        # reorder kernel with 16-beam grid cells (2x descriptors in flight,
        # lg drops 6 -> 4 so per-descriptor size shrinks 172 -> 114 KB)
        ("mr_reorder_c16", dict(megarow=True, mr_chunk=16)),
        ("mr_no_kvgather", dict(megarow=True, bgr=fake_bgr)),
        ("mr_no_ffn", dict(megarow=True, finish=fake_finish)),
        # itemize the ~2.5 ms "selection glue" (VERDICT r3 weak #3): trie
        # masking and exact top-k measured individually on the production
        # megarow path; the residual (glue - trie - topk) is beam select/
        # log-prob bookkeeping
        ("mr_unconstrained", dict(megarow=True, constrained=False)),
        ("mr_approx_topk", dict(megarow=True, topk=approx_topk)),
        ("mr_no_kernels", dict(megarow=True, mr_reorder=fake_mr_reorder,
                               mr_attn=fake_mr_attn)),
    ]
    results = {}
    for name, kw in variants:
        if only and name not in only:
            continue
        results[name] = run_variant(name, **kw)
    if "full" in results:
        base = results["full"]
        for name, v in results.items():
            if name not in ("full", "one_segment"):
                print(f"# {name:16s} saves {1e3*(base-v):7.1f} ms/batch "
                      f"({100*(base-v)/base:4.1f}%)")


if __name__ == "__main__":
    main()
