"""In-training dev evaluation — unconstrained beam search over smtids.

Mirrors the reference trainer's ``evaluate()`` (tasks/trainer.py:870-977):
generate smtids for dev queries WITHOUT the trie constraint, score a hit
when a generated smtid equals the relevant document's smtid, and report
MRR@10 / recall@10 (metrics at :963-965). Also ``first_smtid`` — argmax of
the position-0 logits (reference DenseRetriever.get_first_smtid,
tasks/evaluator.py:733-751).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ripor_tpu.decode.beam import make_beam_search_fn
from ripor_tpu.models.config import RiporConfig
from ripor_tpu.models.ripor import RiporModel


def dev_eval(cfg: RiporConfig, params, query_batches,
             target_codes, num_beams: int = 10,
             dtype=jnp.float32) -> Dict[str, float]:
    """query_batches: iterable of (ids, mask) fixed-shape batches covering
    the dev queries in order. ``target_codes``: either an [n_queries, M]
    array (ONE relevant smtid per query) or a sequence whose i-th element is
    a [P_i, M] array of ALL relevant smtids for query i — real MS MARCO dev
    has multi-positive qrels, which the reference evaluate() handles by
    scoring the generated run against the full qrel (tasks/trainer.py:
    930-965). Returns {"dev_mrr_10", "dev_recall_10"}.

    mrr@10: reciprocal rank of the first relevant beam; recall@10:
    fraction of the query's relevant smtids found in the top 10 (the
    reference's recall_k convention)."""
    from ripor_tpu.trie.succinct import dummy_tables
    fn = make_beam_search_fn(cfg, num_beams, constrained=False, dtype=dtype)
    tables = jax.tree.map(jnp.asarray, dummy_tables(cfg.M))

    targets = [
        {tuple(int(c) for c in row) for row in np.atleast_2d(np.asarray(t))}
        for t in target_codes]

    rr, recalls, n = [], [], 0
    for ids, mask in query_batches:
        scores, codes, _ = fn(params, jnp.asarray(ids), jnp.asarray(mask),
                              tables)
        codes = np.asarray(codes)
        bz = codes.shape[0]
        for b in range(bz):
            if n >= len(targets):
                break
            rel = targets[n]
            rank, found = 0, 0
            for j in range(min(num_beams, 10)):
                if tuple(codes[b, j].tolist()) in rel:
                    found += 1
                    if rank == 0:
                        rank = j + 1
            rr.append(1.0 / rank if rank else 0.0)
            recalls.append(found / max(1, len(rel)))
            n += 1
    return {"dev_mrr_10": float(np.mean(rr)) if rr else 0.0,
            "dev_recall_10": float(np.mean(recalls)) if recalls else 0.0}


def first_smtid(cfg: RiporConfig, params, input_ids, attention_mask,
                dtype=jnp.float32) -> np.ndarray:
    """Most likely first code per query (position-0 logits argmax)."""
    model = RiporModel(cfg, dtype=dtype)

    @jax.jit
    def run(params, ids, mask):
        hidden = model.apply({"params": params}, ids, mask,
                             jnp.zeros((ids.shape[0], 1), jnp.int32))
        logits = model.apply({"params": params}, hidden,
                             method=RiporModel.lm_logits)
        return jnp.argmax(logits[:, 0], axis=-1)

    return np.asarray(run(params, jnp.asarray(input_ids),
                          jnp.asarray(attention_mask)), np.int32)
