"""Teacher reranking engines — batched cross-encoder scoring.

Mirrors tasks/reranker.py: `Reranker.reranking` (:31-59) scores (qid, docid)
pairs from a run file; `reranking_for_same_prefix_pair` (:61-92) scores
(query, prefix-group, docid) triples into the rankdata JSON the phase-3
flywheel consumes: {qid: {smtid: [[docid, score], ...]}}.

The scorer is injected as a callable (BertCrossEncoder or T5SeqCrossEncoder
apply fn) so the engine is model-agnostic; batching is fixed-shape.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Mapping, Sequence, Tuple

import numpy as np

from ripor_tpu.data.datasets import Collection
from ripor_tpu.data.tokenizer import CLS_ID, EOS_ID, PAD_ID, SEP_ID, TextTokenizer

ScoreFn = Callable[[np.ndarray, np.ndarray], np.ndarray]  # (ids, mask) -> [B]


def encode_pairs(tok: TextTokenizer, queries: Sequence[str],
                 docs: Sequence[str], max_length: int
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """[CLS] query [SEP] doc [EOS], truncating the doc side first."""
    B = len(queries)
    ids = np.full((B, max_length), PAD_ID, np.int32)
    mask = np.zeros((B, max_length), np.int32)
    for i, (q, d) in enumerate(zip(queries, docs)):
        q_ids = tok.encode(q)[: max_length // 3]
        d_budget = max_length - len(q_ids) - 3
        d_ids = tok.encode(d)[:d_budget]
        row = [CLS_ID] + q_ids + [SEP_ID] + d_ids + [EOS_ID]
        ids[i, :len(row)] = row
        mask[i, :len(row)] = 1
    return ids, mask


def rerank_pairs(score_fn: ScoreFn, tok: TextTokenizer,
                 queries: Collection, docs: Collection,
                 pairs: Sequence[Tuple[str, str]], batch_size: int = 64,
                 max_length: int = 256) -> Dict[str, Dict[str, float]]:
    """Score (qid, docid) pairs -> {qid: {docid: score}} (reference
    Reranker.reranking, tasks/reranker.py:31-59)."""
    out: Dict[str, Dict[str, float]] = {}
    for s in range(0, len(pairs), batch_size):
        chunk = pairs[s:s + batch_size]
        pad = batch_size - len(chunk)
        q_texts = [queries[q] for q, _ in chunk] + [""] * pad
        d_texts = [docs[d] for _, d in chunk] + [""] * pad
        ids, mask = encode_pairs(tok, q_texts, d_texts, max_length)
        scores = np.asarray(score_fn(ids, mask), np.float32)[:len(chunk)]
        for (qid, did), sc in zip(chunk, scores):
            out.setdefault(str(qid), {})[str(did)] = float(sc)
    return out


def rerank_qid_smtid_docids(score_fn: ScoreFn, tok: TextTokenizer,
                            queries: Collection, docs: Collection,
                            qid_smtid_docids: Mapping[str, Mapping[str, Sequence[str]]],
                            batch_size: int = 64, max_length: int = 256
                            ) -> Dict[str, Dict[str, List[List]]]:
    """Score every (query, prefix-group, docid) triple -> rankdata
    {qid: {smtid: [[docid, score], ...]}} sorted by score desc (reference
    cross_encoder_rerank_for_qid_smtid_docids, rerank.py:587-654)."""
    triples: List[Tuple[str, str, str]] = []
    for qid, smtid_map in qid_smtid_docids.items():
        for smtid, docids in smtid_map.items():
            for did in docids:
                triples.append((str(qid), str(smtid), str(did)))
    pair_scores = rerank_pairs(score_fn, tok, queries, docs,
                               [(q, d) for q, _, d in triples],
                               batch_size, max_length)
    out: Dict[str, Dict[str, List[List]]] = {}
    for qid, smtid, did in triples:
        out.setdefault(qid, {}).setdefault(smtid, []).append(
            [did, pair_scores[qid][did]])
    for qid in out:
        for smtid in out[qid]:
            out[qid][smtid].sort(key=lambda x: -x[1])
    return out


def add_qrel_positives(run: Dict[str, Dict[str, float]],
                       qrel: Mapping[str, Mapping[str, int]],
                       boost: float = 1.0) -> Dict[str, Dict[str, float]]:
    """Force qrel positives to the top of each query's candidate list
    (reference add_qrel_to_rerank_run.py:16-46: positives get max score + 1)."""
    out = {}
    for qid, docs in run.items():
        docs = dict(docs)
        rel = qrel.get(qid, {})
        if rel:
            top = max(docs.values()) if docs else 0.0
            for did, r in rel.items():
                if r > 0:
                    docs[str(did)] = top + boost
        out[qid] = docs
    return out
