"""The full RIPOR 3-phase training recipe, end-to-end in one driver.

Mirrors the reference's chained shell pipelines (full_scripts/
full_lng_knp_train_pipline.sh:28-100 + marco_train_t5seq_cross_encoder.sh +
all_aq_pipline.sh; SURVEY.md §3.5) as one resumable function:

  phase 1  dense pretrain (t5seq_pretrain_margin_mse)
  docids   corpus encode -> RQ -> docid_to_smtid + codebook install
  teacher  BertCrossEncoder trained on bce_examples (bert_bce)
  phase 2  seq2seq CE + MarginMSE on teacher-scored trainset
  phase 3  flywheel datagen (teacher-rescored, decay-merged) + prefix
           curriculum: sub-smtid MarginMSE at 4, lng_knp at 8/16/32

Every stage checkpoints into the workspace and is skipped when its outputs
exist (Workspace/stage_train semantics), so an interrupted run resumes.
"""
from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ripor_tpu.data import (
    BceExamples,
    BertBceCollator,
    Collection,
    MarginMSECollator,
    PretrainCollator,
    Seq2SeqCollator,
    Seq2SeqExamples,
    TeacherScoreExamples,
    UnigramTokenizer,
    batches_from_bce,
    batches_from_seq2seq,
    batches_from_teacher_examples,
    build_bce_examples,
    load_docid_to_smtid,
    load_qrel,
    save_bce_examples,
)
from ripor_tpu.models import RiporConfig, RiporModel, T5Config
from ripor_tpu.models.cross_encoder import BertCrossEncoder
from ripor_tpu.models.ripor import init_ripor_params
from ripor_tpu.pipeline.e2e import _small_cfg
from ripor_tpu.pipeline.flywheel import datagen_round, write_jsonl
from ripor_tpu.pipeline.recipe import (
    Workspace,
    stage_build_docids,
    stage_build_trie,
    stage_encode_corpus,
    stage_evaluate,
    stage_install_codebooks,
    stage_retrieve,
    stage_tokenizer,
    stage_train,
)
from ripor_tpu.train import TrainConfig


def _epochs_steps(n_examples: int, batch_size: int, epochs: int) -> int:
    return max(1, epochs * max(1, n_examples // batch_size))


def _make_pretrain_examples(ws: Workspace, qrel, docids: Sequence[str],
                            n_negs: int, seed: int) -> str:
    """Phase-1 trainset: {"qid", "docids": [pos, negs...], "scores"} with
    synthetic teacher margins (the reference uses a MarginMSE distillation
    set from its dense-teacher run; on a slice the qrel provides positives
    and uniform negatives stand in)."""
    path = ws.path("pretrain_trainset.jsonl")
    if path.exists():
        return str(path)
    rng = np.random.default_rng(seed)
    rows = []
    for qid, rels in qrel.items():
        pos = [d for d, r in rels.items() if r > 0]
        if not pos:
            continue
        negs = [d for d in rng.choice(docids, size=min(n_negs + len(pos),
                                                       len(docids)),
                                      replace=False) if d not in rels][:n_negs]
        if not negs:
            continue
        rows.append({"qid": str(qid), "docids": [pos[0]] + [str(d) for d in negs],
                     "scores": [1.0] + [0.0] * len(negs)})
    write_jsonl(str(path), rows)
    return str(path)


def _train_bert_teacher(ws: Workspace, tok, queries: Collection,
                        docs: Collection, qrel, epochs: int,
                        batch_size: int, seed: int,
                        geometry: Optional[Dict] = None) -> str:
    """Train the BertCrossEncoder teacher on bce_examples built from the
    qrel + full candidate pool (reference build_bce_example_for_t5seq_
    encoder.py + CrossEncoder BCE training) and save it with its geometry.
    Returns the checkpoint dir."""
    ckpt = ws.path("checkpoints/bert_teacher")
    geo = geometry or dict(d_model=64, num_layers=2, num_heads=4, d_ff=128,
                           max_position=128)
    if (ckpt / "params").exists():
        return str(ckpt)
    bce_path = ws.path("bce_examples.train.tsv")
    if not bce_path.exists():
        run = {qid: {d: 1.0 for d in docs.ids} for qid in qrel}
        save_bce_examples(bce_path, build_bce_examples(
            qrel, run, neg_sample=8, seed=seed))
    examples = BceExamples(bce_path)
    coll = BertBceCollator(tok, queries, docs, max_length=64)
    model = BertCrossEncoder(vocab_size=tok.vocab_size, **geo)
    ids0 = jnp.ones((1, 8), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(seed)}, ids0,
                        ids0)["params"]
    bz = min(batch_size, len(examples))
    tcfg = TrainConfig(loss_type="bert_bce", learning_rate=3e-3,
                       total_steps=_epochs_steps(len(examples), bz, epochs))
    batches = batches_from_bce(examples, coll, bz, epochs=epochs,
                               drop_last=False)
    stage_train(ws, "bert_teacher", model, params, tcfg, batches, None,
                rng_seed=seed)
    (ckpt / "bert_geometry.json").write_text(json.dumps(geo))
    return str(ckpt)


def run_full_recipe(workspace: str, docs_dir: str, queries_dir: str,
                    qrel_path: str,
                    M: int = 8, K: int = 32, vocab_size: int = 600,
                    cfg: Optional[RiporConfig] = None,
                    phase1_epochs: int = 10, teacher_epochs: int = 20,
                    s2s_epochs: int = 40, mm_epochs: int = 10,
                    phase3_epochs: int = 10,
                    curriculum: Optional[Sequence[int]] = None,
                    num_beams: int = 10, topk: int = 100,
                    batch_size: int = 16, decay: int = 2,
                    teacher_geometry: Optional[Dict] = None,
                    seed: int = 0) -> Dict[str, Dict[str, float]]:
    """Run phases 1..3 on a corpus slice; returns per-phase retrieval
    metrics {"phase2": {...}, "phase3": {...}} so callers can assert the
    curriculum improves retrieval (reference's end state after
    full_lng_knp_train_pipline.sh)."""
    ws = Workspace(workspace)
    docs = Collection(docs_dir)
    queries = Collection(queries_dir)
    qrel = load_qrel(qrel_path)

    tok = stage_tokenizer(ws, docs.texts + queries.texts, vocab_size)
    cfg = cfg or _small_cfg(M, K, tok.vocab_size)
    # curriculum from the RESOLVED config's M — a custom cfg with M=32 must
    # get the full 4->8->16->32 ladder even if the M parameter was left at
    # its default (reference full_lng_knp_train_pipline.sh:28-100)
    curriculum = list(curriculum) if curriculum is not None else sorted(
        {p for p in (4, 8, 16, 32) if p < cfg.M} | {cfg.M})
    model = RiporModel(cfg)
    params = init_ripor_params(jax.random.PRNGKey(seed), cfg)

    # ---- phase 1: dense pretrain --------------------------------------
    pre_path = _make_pretrain_examples(ws, qrel, docs.ids, n_negs=4,
                                       seed=seed)
    pre_examples = TeacherScoreExamples(pre_path)
    pre_coll = PretrainCollator(tok, queries, docs, max_length=64)
    bz = min(batch_size, len(pre_examples))
    tcfg = TrainConfig(loss_type="t5seq_pretrain_margin_mse",
                       learning_rate=1e-3,
                       total_steps=_epochs_steps(len(pre_examples), bz,
                                                 phase1_epochs))
    params = stage_train(
        ws, "phase1_pretrain", model, params, tcfg,
        batches_from_teacher_examples(pre_examples, pre_coll, bz,
                                      epochs=phase1_epochs, drop_last=False),
        cfg, rng_seed=seed)

    # ---- DocID build ---------------------------------------------------
    embs = stage_encode_corpus(ws, model, params, docs, tok, max_length=64,
                               batch_size=batch_size)
    codes = stage_build_docids(ws, embs, docs.ids, M=cfg.M, K=cfg.K)
    params = stage_install_codebooks(ws, params)
    docids, codes = load_docid_to_smtid(ws.path("docid_to_smtid.json"))
    d2c = dict(zip(docids, codes))

    # ---- cross-encoder teacher ----------------------------------------
    # teacher_geometry defaults to a CI-sized toy model inside
    # _train_bert_teacher; real runs should pass MiniLM-class geometry,
    # e.g. dict(d_model=384, num_layers=6, num_heads=12, d_ff=1536,
    # max_position=512) (reference teacher: ms-marco-MiniLM-L-6-v2,
    # arguments.py:218)
    teacher_ckpt = _train_bert_teacher(ws, tok, queries, docs, qrel,
                                       epochs=teacher_epochs,
                                       batch_size=batch_size, seed=seed,
                                       geometry=teacher_geometry)
    from ripor_tpu.evaluation.reranker import load_bert_teacher, rerank_pairs
    teacher_fn = load_bert_teacher(teacher_ckpt, tok.vocab_size)

    def teacher_pair_scores(pairs):
        return rerank_pairs(teacher_fn, tok, queries, docs, list(pairs),
                            batch_size=64, max_length=64)

    # ---- phase 2: seq2seq + teacher MarginMSE --------------------------
    s2s_path = ws.path("s2s_examples.jsonl")
    if not s2s_path.exists():
        write_jsonl(str(s2s_path),
                    [{"docid": d, "query": queries[qid]}
                     for qid, rels in qrel.items()
                     for d, r in rels.items() if r > 0])
    s2s = Seq2SeqExamples(s2s_path)
    bz = min(batch_size, len(s2s))
    tcfg = TrainConfig(loss_type="t5seq_aq_encoder_seq2seq",
                       learning_rate=1e-3,
                       total_steps=_epochs_steps(len(s2s), bz, s2s_epochs))
    params = stage_train(
        ws, "phase2_seq2seq", model, params, tcfg,
        batches_from_seq2seq(s2s, Seq2SeqCollator(tok, d2c, max_length=32),
                             bz, epochs=s2s_epochs, drop_last=False),
        cfg, rng_seed=seed)

    mm_path = ws.path("phase2_mm_trainset.jsonl")
    if not mm_path.exists():
        rng = np.random.default_rng(seed + 1)
        rows = []
        for qid, rels in qrel.items():
            pos = [d for d, r in rels.items() if r > 0]
            if not pos:
                continue
            negs = [d for d in rng.choice(docids, size=min(6, len(docids)),
                                          replace=False)
                    if d not in rels][:4]
            cands = [pos[0]] + [str(d) for d in negs]
            scored = teacher_pair_scores([(qid, d) for d in cands])
            rows.append({"qid": str(qid), "docids": cands,
                         "scores": [scored[str(qid)][d] for d in cands]})
        write_jsonl(str(mm_path), rows)
    mm = TeacherScoreExamples(mm_path)
    bz = min(batch_size, len(mm))
    tcfg = TrainConfig(loss_type="t5seq_aq_encoder_margin_mse",
                       learning_rate=5e-4,
                       total_steps=_epochs_steps(len(mm), bz, mm_epochs))
    params = stage_train(
        ws, "phase2_margin_mse", model, params, tcfg,
        batches_from_teacher_examples(
            mm, MarginMSECollator(tok, queries, d2c, max_length=64), bz,
            epochs=mm_epochs, drop_last=False),
        cfg, rng_seed=seed)

    trie = stage_build_trie(ws, codes, cfg.K)
    run2 = stage_retrieve(ws, cfg, params, tok, queries, trie, docids,
                          num_beams=num_beams, topk=topk,
                          run_name="run_phase2.json")
    metrics = {"phase2": stage_evaluate(ws, run2, qrel,
                                        perf_name="perf_phase2.json")}

    # ---- phase 3: flywheel + prefix curriculum -------------------------
    qid_to_docids = {qid: [d for d, r in rels.items() if r > 0]
                     for qid, rels in qrel.items()}
    qid_to_docids = {q: ds for q, ds in qid_to_docids.items() if ds}
    for plen in curriculum:
        ds_path = ws.path(f"lng_knp_qid_smtids_scores_{plen}.train.json")
        if not ds_path.exists():
            ws.log(f"phase3 datagen at prefix {plen}")
            merged = datagen_round(
                cfg, params, tok, queries, qid_to_docids, codes, docids,
                teacher_pair_scores, prefix_len=plen,
                num_beams=min(num_beams, 10), batch_size=4, decay=decay)
            write_jsonl(str(ds_path), merged)
        examples = TeacherScoreExamples(ds_path, smtid_as_docid=True)
        if plen >= 8:
            loss_type = "t5seq_aq_encoder_lng_knp_margin_mse"
            prefix = examples.prefix_lengths_present()
        else:
            loss_type = "t5seq_aq_encoder_margin_mse"   # sub-smtid stage
            prefix = ()
        coll = MarginMSECollator(tok, queries, None, max_length=64,
                                 smtid_as_docid=True, prefix_lengths=prefix)
        bz = min(batch_size, len(examples))
        tcfg = TrainConfig(loss_type=loss_type, learning_rate=5e-4,
                           total_steps=_epochs_steps(len(examples), bz,
                                                     phase3_epochs))
        params = stage_train(
            ws, f"phase3_mnt_{plen}", model, params, tcfg,
            batches_from_teacher_examples(examples, coll, bz,
                                          epochs=phase3_epochs,
                                          drop_last=False),
            cfg, rng_seed=seed + plen)

    # final checkpoint under the conventional name for the retrieve CLI
    final = ws.path("checkpoints/final")
    if not (final / "params").exists():
        from ripor_tpu.train import save_params
        save_params(final, params, cfg)

    run3 = stage_retrieve(ws, cfg, params, tok, queries, trie, docids,
                          num_beams=num_beams, topk=topk,
                          run_name="run_phase3.json")
    metrics["phase3"] = stage_evaluate(ws, run3, qrel,
                                       perf_name="perf_phase3.json")
    ws.log(f"full recipe metrics: {metrics}")
    return metrics
