"""End-to-end pipeline drivers.

``run_e2e`` is the minimum end-to-end slice (SURVEY.md §7.2, BASELINE
config #1): tokenizer -> corpus encode -> RQ DocIDs -> seq2seq training ->
trie -> constrained-beam retrieval -> trec metrics. It exercises every layer
of the framework on one chip.

``run_train_from_config`` is the generic single-phase trainer behind the
``train`` CLI (reference: t5_pretrainer/main.py).
"""
from __future__ import annotations

import json
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ripor_tpu.data import (
    Collection,
    MarginMSECollator,
    Seq2SeqCollator,
    Seq2SeqExamples,
    TeacherScoreExamples,
    UnigramTokenizer,
    batches_from_seq2seq,
    batches_from_teacher_examples,
    load_docid_to_smtid,
    load_qrel,
)
from ripor_tpu.models import RiporConfig, RiporModel, T5Config
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


def _small_cfg(M: int, K: int, vocab_size: int) -> RiporConfig:
    return RiporConfig(
        t5=T5Config(vocab_size=vocab_size, d_model=256, d_kv=32, d_ff=1024,
                    num_layers=4, num_decoder_layers=4, num_heads=8,
                    dropout_rate=0.1),
        M=M, K=K)


def run_e2e(workspace: str, docs_dir: str, queries_dir: str, qrel_path: str,
            s2s_examples_path: Optional[str] = None,
            M: int = 8, K: int = 64, vocab_size: int = 4000,
            s2s_epochs: int = 40, learning_rate: float = 1e-3,
            batch_size: int = 32, num_beams: int = 10, topk: int = 100,
            seed: int = 0, d_model_cfg: Optional[RiporConfig] = None
            ) -> Dict[str, float]:
    ws = Workspace(workspace)
    docs = Collection(docs_dir)
    queries = Collection(queries_dir)
    qrel = load_qrel(qrel_path)

    tok = stage_tokenizer(ws, docs.texts + queries.texts, vocab_size)
    cfg = d_model_cfg or _small_cfg(M, K, tok.vocab_size)
    model = RiporModel(cfg)

    rng = np.random.default_rng(seed)
    ids0 = jnp.ones((1, 8), jnp.int32)
    codes0 = jnp.zeros((1, cfg.M), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(seed)}, ids0, ids0,
                        codes0)["params"]

    # 1) encode corpus with the (untrained or pretrained) dense encoder
    embs = stage_encode_corpus(ws, model, params, docs, tok, max_length=64,
                               batch_size=batch_size)
    # 2) RQ DocIDs + install codebooks into the decoder head
    codes = stage_build_docids(ws, embs, docs.ids, M=cfg.M, K=cfg.K)
    params = stage_install_codebooks(ws, params)
    # 3) seq2seq training: provided pseudo-queries, else qrel pairs
    if s2s_examples_path is None:
        s2s_examples_path = str(ws.path("s2s_from_qrel.jsonl"))
        if not ws.has("s2s_from_qrel.jsonl"):
            with open(s2s_examples_path, "w") as f:
                for qid, rels in qrel.items():
                    for did, r in rels.items():
                        if r > 0:
                            f.write(json.dumps(
                                {"docid": did, "query": queries[qid]}) + "\n")
    examples = Seq2SeqExamples(s2s_examples_path)
    d2c = {d: c for d, c in zip(docs.ids, codes)}
    coll = Seq2SeqCollator(tok, d2c, max_length=32)
    tcfg = TrainConfig(loss_type="t5seq_aq_encoder_seq2seq",
                       learning_rate=learning_rate,
                       total_steps=max(1, s2s_epochs * max(1, len(examples) // batch_size)))
    batches = batches_from_seq2seq(examples, coll, batch_size=min(batch_size, len(examples)),
                                   epochs=s2s_epochs, drop_last=False)
    params = stage_train(ws, "final", model, params, tcfg, batches, cfg,
                         rng_seed=seed)
    # 4) trie + retrieval + metrics
    trie = stage_build_trie(ws, codes, cfg.K)
    run = stage_retrieve(ws, cfg, params, tok, queries, trie, docs.ids,
                         num_beams=num_beams, topk=topk)
    return stage_evaluate(ws, run, qrel)


def run_train_from_config(cfg_dict: Dict) -> None:
    """Generic one-phase training job (reference main.py:34-190 dispatch).

    loss_type selects the (model, dataset, collator) family:
      t5seq_aq_encoder_{margin_mse,lng_knp_margin_mse,ranknet} — RiporModel
        + teacher-score trainset (reference MarginMSEforT5SeqAQ*)
      t5seq_aq_encoder_seq2seq — RiporModel + {"docid","query"} JSONL
      t5seq_pretrain_margin_mse / margin_mse / kldiv — doc-text pairs
        (PretrainCollator; margin_mse/kldiv drive the T5DenseEncoder
        baseline, reference t5model_encoder.py)
      t5seq_bce / bert_bce — cross-encoder teachers on bce_examples TSV
        (reference marco_train_t5seq_cross_encoder.sh — whose main.py
        branch upstream is NotImplementedError; trainable here)
    """
    import jax
    from ripor_tpu.data import (BceExamples, BertBceCollator, PretrainCollator,
                                T5SeqBceCollator, batches_from_bce)

    ws = Workspace(cfg_dict["workspace"])
    tok = UnigramTokenizer.load(ws.path("tokenizer.json"))
    queries = Collection(cfg_dict["queries_dir"])
    loss_type = cfg_dict["loss_type"]
    batch_size = cfg_dict.get("batch_size", 64)
    epochs = cfg_dict.get("epochs", 1)
    max_length = cfg_dict.get("max_length", 64)
    rng0 = jax.random.PRNGKey(cfg_dict.get("seed", 0))

    d2c = None
    if ws.has("docid_to_smtid.json"):
        docids, codes = load_docid_to_smtid(ws.path("docid_to_smtid.json"))
        d2c = dict(zip(docids, codes))

    def ripor_cfg() -> RiporConfig:
        return RiporConfig.load(cfg_dict["model_config"]) \
            if "model_config" in cfg_dict else _small_cfg(
                cfg_dict.get("M", 32), cfg_dict.get("K", 256),
                cfg_dict.get("vocab_size", tok.vocab_size))

    ids0 = jnp.ones((1, 8), jnp.int32)
    if loss_type == "bert_bce":
        from ripor_tpu.models.cross_encoder import BertCrossEncoder
        model = BertCrossEncoder(vocab_size=tok.vocab_size,
                                 **cfg_dict.get("bert_geometry", {}))
        model_cfg = None
        params = model.init({"params": rng0}, ids0, ids0)["params"]
        docs = Collection(cfg_dict["docs_dir"])
        examples = BceExamples(cfg_dict["examples_path"])
        coll = BertBceCollator(tok, queries, docs, max_length=max_length)
        batches = batches_from_bce(examples, coll, batch_size, epochs=epochs)
    elif loss_type == "t5seq_bce":
        from ripor_tpu.models.cross_encoder import T5SeqCrossEncoder
        model_cfg = ripor_cfg()
        model = T5SeqCrossEncoder(model_cfg)
        params = model.init({"params": rng0}, ids0, ids0,
                            jnp.zeros((1, model_cfg.M), jnp.int32))["params"]
        examples = BceExamples(cfg_dict["examples_path"])
        coll = T5SeqBceCollator(tok, queries, d2c, max_length=max_length)
        batches = batches_from_bce(examples, coll, batch_size, epochs=epochs)
    elif loss_type in ("margin_mse", "kldiv", "t5seq_pretrain_margin_mse"):
        docs = Collection(cfg_dict["docs_dir"])
        examples = TeacherScoreExamples(cfg_dict["examples_path"])
        if loss_type == "t5seq_pretrain_margin_mse":
            model_cfg = ripor_cfg()
            model = RiporModel(model_cfg)
            params = model.init({"params": rng0}, ids0, ids0,
                                jnp.zeros((1, model_cfg.M), jnp.int32))["params"]
            prefix_len = cfg_dict.get("prefix_len", 0)
            coll = PretrainCollator(tok, queries, docs, max_length=max_length,
                                    docid_to_codes=d2c if prefix_len else None,
                                    prefix_len=prefix_len)
        else:
            from ripor_tpu.models.dense_encoder import T5DenseEncoder
            model_cfg = ripor_cfg()
            model = T5DenseEncoder(model_cfg.t5)
            params = model.init({"params": rng0}, ids0, ids0)["params"]
            coll = PretrainCollator(tok, queries, docs, max_length=max_length)
        batches = batches_from_teacher_examples(examples, coll, batch_size,
                                                epochs=epochs)
    elif loss_type == "t5seq_aq_encoder_seq2seq":
        model_cfg = ripor_cfg()
        model = RiporModel(model_cfg)
        params = model.init({"params": rng0}, ids0, ids0,
                            jnp.zeros((1, model_cfg.M), jnp.int32))["params"]
        examples = Seq2SeqExamples(cfg_dict["examples_path"])
        coll = Seq2SeqCollator(tok, d2c, max_length=max_length)
        batches = batches_from_seq2seq(examples, coll, batch_size,
                                       epochs=epochs)
    else:
        model_cfg = ripor_cfg()
        model = RiporModel(model_cfg)
        params = model.init({"params": rng0}, ids0, ids0,
                            jnp.zeros((1, model_cfg.M), jnp.int32))["params"]
        examples = TeacherScoreExamples(
            cfg_dict["examples_path"],
            smtid_as_docid=cfg_dict.get("smtid_as_docid", False))
        prefix = examples.prefix_lengths_present() \
            if loss_type == "t5seq_aq_encoder_lng_knp_margin_mse" else ()
        coll = MarginMSECollator(tok, queries, d2c, max_length=max_length,
                                 smtid_as_docid=cfg_dict.get("smtid_as_docid", False),
                                 prefix_lengths=prefix)
        batches = batches_from_teacher_examples(examples, coll, batch_size,
                                                epochs=epochs)

    if "init_checkpoint" in cfg_dict:
        from ripor_tpu.train import load_params
        params = load_params(cfg_dict["init_checkpoint"], like=params)
    tcfg = TrainConfig(loss_type=loss_type,
                       learning_rate=cfg_dict.get("learning_rate", 1e-4),
                       total_steps=cfg_dict.get("total_steps", 100_000),
                       grad_accum=cfg_dict.get("grad_accum", 1))
    stage_train(ws, cfg_dict.get("phase_name", loss_type), model, params,
                tcfg, batches, model_cfg)
