"""Multi-phase recipe orchestration — replaces full_scripts/*.sh.

Artifact-directory layout mirrors the reference's experiment dirs:
  workspace/
    tokenizer.json            (new: trained Unigram tokenizer)
    doc_embeds.npy            (reference: doc_embeds.mmap, evaluator.py:664-677)
    text_ids.tsv              (doc order of the embedding matrix)
    codebooks.npy             (reference: faiss rq.codebooks)
    docid_to_smtid.json       (reference format incl. -1 sentinel)
    trie.npz                  (reference: list_smtid_to_nextids pickle)
    checkpoints/<phase>/      (params + config)
    run.json / perf.json      (reference: evaluate.py:276-291)

Each stage is a plain function; `Phases` chains them. Stages are
re-entrant: they skip work when their artifact already exists (the
reference's bash pipelines get this by being run stepwise by hand).
"""
from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ripor_tpu.data import (
    Collection,
    TextTokenizer,
    UnigramTokenizer,
    load_docid_to_smtid,
    save_docid_to_smtid,
    tokenize_docs,
    tokenize_queries,
)
from ripor_tpu.decode import expand_groups_to_docids
from ripor_tpu.decode.beam import make_beam_search_fn
from ripor_tpu.evaluation import evaluate_run, retrieve_to_run
from ripor_tpu.models import RiporModel, RiporConfig, install_codebooks
from ripor_tpu.quantize import RQCodebooks, rq_encode, train_rq
from ripor_tpu.trie import DocIdTrie, build_trie
from ripor_tpu.train import TrainConfig, Trainer, load_params, save_params


class Workspace:
    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def path(self, name: str) -> Path:
        return self.root / name

    def has(self, name: str) -> bool:
        return self.path(name).exists()

    def log(self, msg: str) -> None:
        print(f"[pipeline {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def load_tokenizer(path) -> TextTokenizer:
    """Load a saved tokenizer, dispatching on file content: WordTokenizer
    files carry {"kind": "word"}, anything else is a ``tokenizers`` JSON."""
    import json as _json
    from ripor_tpu.data.tokenizer import WordTokenizer
    try:
        obj = _json.loads(Path(path).read_text())
    except (ValueError, UnicodeDecodeError):
        obj = None
    if isinstance(obj, dict) and obj.get("kind") == "word":
        return WordTokenizer.load(path)
    return UnigramTokenizer.load(path)


def stage_tokenizer(ws: Workspace, corpus_texts: Iterable[str],
                    vocab_size: int = 32000,
                    kind: str = "unigram") -> TextTokenizer:
    """``kind``: "unigram" (production; SentencePiece-family, Rust trainer
    is nondeterministic) or "word" (deterministic — CI recipes that gate on
    exact metrics)."""
    if ws.has("tokenizer.json"):
        return load_tokenizer(ws.path("tokenizer.json"))
    ws.log(f"training tokenizer ({kind})")
    if kind == "word":
        from ripor_tpu.data.tokenizer import WordTokenizer
        tok = WordTokenizer.train(corpus_texts, vocab_size=vocab_size)
    elif kind == "unigram":
        tok = UnigramTokenizer.train(corpus_texts, vocab_size=vocab_size)
    else:
        raise ValueError(f"unknown tokenizer kind {kind!r}")
    tok.save(ws.path("tokenizer.json"))
    return tok


def stage_encode_corpus(ws: Workspace, model: RiporModel, params,
                        docs: Collection, tok: TextTokenizer,
                        max_length: int = 128, batch_size: int = 64,
                        out_name: str = "doc_embeds.npy") -> np.ndarray:
    """Dense-encode all docs (reference DenseIndexing + mmap merge,
    evaluate.py:184-227). ``out_name`` distinguishes encodes by different
    checkpoints (the reference writes one mmap per model dir)."""
    if ws.has(out_name):
        return np.load(ws.path(out_name))
    ws.log(f"encoding {len(docs)} docs -> {out_name}")

    @jax.jit
    def rep(ids, mask):
        return model.apply({"params": params}, ids, mask,
                           method=RiporModel.dense_rep)

    out = []
    n = len(docs)
    for s in range(0, n, batch_size):
        texts = [docs.text_at(i) for i in range(s, min(s + batch_size, n))]
        pad = batch_size - len(texts)
        ids, mask = tokenize_docs(tok, texts + [""] * pad, max_length)
        r = np.asarray(rep(jnp.asarray(ids), jnp.asarray(mask)), np.float32)
        out.append(r[:len(texts)])
    embs = np.concatenate(out, axis=0)
    np.save(ws.path(out_name), embs)
    with open(ws.path("text_ids.tsv"), "w") as f:
        for i, did in enumerate(docs.ids):
            f.write(f"{i}\t{did}\n")
    return embs


def stage_build_docids(ws: Workspace, embs: np.ndarray, docids: Sequence[str],
                       M: int, K: int, kmeans_iters: int = 25,
                       encode_beam: int = 4) -> np.ndarray:
    """RQ codebooks + codes -> docid_to_smtid.json + codebooks.npy
    (reference all_aq_pipline steps 3,5,6; SURVEY.md §3.4)."""
    if ws.has("docid_to_smtid.json") and ws.has("codebooks.npy"):
        _, codes = load_docid_to_smtid(ws.path("docid_to_smtid.json"))
        return codes
    ws.log(f"training RQ {M}x{K} on {embs.shape}")
    books = train_rq(embs, M=M, K=K, kmeans_iters=kmeans_iters)
    books.save(ws.path("codebooks.npy"))
    codes = rq_encode(books, embs, beam=encode_beam)
    save_docid_to_smtid(ws.path("docid_to_smtid.json"), list(docids), codes)
    uniq = len({tuple(r) for r in codes.tolist()})
    ws.log(f"codes built: {uniq}/{len(codes)} unique smtids")
    return codes


def stage_install_codebooks(ws: Workspace, params,
                            shared_output_input_embeds: bool = True):
    books = RQCodebooks.load(ws.path("codebooks.npy"))
    return install_codebooks(params, books.codebooks,
                             shared_output_input_embeds)


def stage_build_trie(ws: Workspace, codes: np.ndarray, K: int) -> DocIdTrie:
    if ws.has("trie.npz"):
        return DocIdTrie.load(ws.path("trie.npz"))
    ws.log("building trie")
    trie = build_trie(codes, K)
    trie.save(ws.path("trie.npz"))
    ws.log(f"trie: {trie.num_internal} internal, {trie.num_groups} groups, "
           f"{trie.memory_bytes() / 1e6:.1f} MB")
    return trie


def stage_train(ws: Workspace, phase_name: str, model: RiporModel,
                params, tcfg: TrainConfig, batches: Iterable[Dict],
                cfg: RiporConfig, rng_seed: int = 0, mesh=None,
                anchor_params=None):
    ckpt_dir = ws.path(f"checkpoints/{phase_name}")
    if (ckpt_dir / "params").exists():
        ws.log(f"{phase_name}: restoring existing checkpoint")
        return load_params(ckpt_dir, like=params)
    ws.log(f"{phase_name}: training")
    trainer = Trainer(model, tcfg, params, mesh=mesh,
                      anchor_params=anchor_params,
                      log_fn=lambda m, s: ws.log(f"{phase_name} step {s}: "
                                                 f"loss={m['loss']:.4f}"))
    state, _ = trainer.run(batches, jax.random.PRNGKey(rng_seed))
    save_params(ckpt_dir, state.params, cfg)
    return state.params


def stage_retrieve(ws: Workspace, cfg: RiporConfig, params, tok: TextTokenizer,
                   queries: Collection, trie: DocIdTrie, docids: Sequence[str],
                   num_beams: int = 10, topk: int = 100,
                   max_length: int = 64, batch_size: int = 8,
                   run_name: str = "run.json",
                   kv_cache_int8: bool = False,
                   kv_cache_quant: str = None,
                   max_steps: int = None,
                   ffn_int8: bool = None,
                   ckpt_dir=None) -> Dict[str, Dict[str, float]]:
    """Constrained-beam retrieval over all queries -> trec run dict
    (reference t5seq_aq_retrieve_docids, evaluate.py:396-526).
    ``kv_cache_int8``/``kv_cache_quant``: quantized decode cache
    (see make_beam_search_fn; "int4" packs nibble rows).
    ``max_steps`` < M decodes a PREFIX run: pass a trie built from
    prefix-truncated codes — this is the sub-smtid retrieval the paper's
    prefix-oriented claim is measured on (reference
    t5seq_aq_retrieve_docids_use_sub_smtid, full_evaluate...sh:176-205).
    ``ffn_int8`` (None = env RIPOR_FFN_INT8) is PREFLIGHTED through
    decode.quant_gate against ``ckpt_dir``'s recorded validation — an
    unvalidated ffn_int8 combo refuses instead of silently perturbing the
    run (VERDICT r2 weak #6)."""
    import jax
    from ripor_tpu.trie.succinct import succinct_tables
    if ffn_int8 is None:
        import os
        ffn_int8 = os.environ.get("RIPOR_FFN_INT8", "0") == "1"
    if ffn_int8:
        from ripor_tpu.decode.quant_gate import ensure_quant_validated
        ensure_quant_validated(kv_cache_quant
                               or ("int8" if kv_cache_int8 else None),
                               ffn_int8, ckpt_dir=ckpt_dir)
    fn = make_beam_search_fn(cfg, num_beams, constrained=True,
                             kv_cache_int8=kv_cache_int8,
                             kv_cache_quant=kv_cache_quant,
                             max_steps=max_steps, ffn_int8=ffn_int8)
    tables = jax.tree.map(jnp.asarray, succinct_tables(trie))
    run: Dict[str, Dict[str, float]] = {}
    n = len(queries)
    for s in range(0, n, batch_size):
        texts = [queries.text_at(i) for i in range(s, min(s + batch_size, n))]
        pad = batch_size - len(texts)
        ids, mask = tokenize_queries(tok, texts + [""] * pad, max_length)
        scores, codes, state = fn(params, jnp.asarray(ids), jnp.asarray(mask),
                                  tables)
        scores = np.asarray(scores)
        groups = np.where(np.asarray(state) <= -2, -2 - np.asarray(state), -1)
        for bi in range(len(texts)):
            qid = queries.ids[s + bi]
            docs, doc_scores = expand_groups_to_docids(
                trie, groups[bi], scores[bi], topk)
            run[str(qid)] = {str(docids[d]): float(v)
                             for d, v in zip(docs, doc_scores)}
    with open(ws.path(run_name), "w") as f:
        json.dump(run, f)
    return run


def stage_evaluate(ws: Workspace, run, qrel,
                   metrics: Sequence[str] = ("mrr_10", "recall_10", "recall_100"),
                   perf_name: str = "perf.json") -> Dict[str, float]:
    out = {m: evaluate_run(run, qrel, m) for m in metrics}
    with open(ws.path(perf_name), "w") as f:
        json.dump(out, f, indent=2)
    ws.log(f"metrics: {out}")
    return out
