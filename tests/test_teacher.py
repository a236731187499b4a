"""Cross-encoder teacher end-to-end: BCE datasets/collators, trainable
teacher losses through the generic Trainer, and the datagen rescoring path
with its no-zero-default guarantee (reference rerank.py:587-654 +
build_bce_example_for_t5seq_encoder.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ripor_tpu.data import (
    BceExamples,
    BertBceCollator,
    Collection,
    HashTokenizer,
    T5SeqBceCollator,
    batches_from_bce,
    build_bce_examples,
    save_bce_examples,
)
from ripor_tpu.models import ripor_small
from ripor_tpu.train import TrainConfig, Trainer


@pytest.fixture()
def tiny_corpus(tmp_path):
    (tmp_path / "docs").mkdir()
    (tmp_path / "docs" / "raw.tsv").write_text(
        "".join(f"d{i}\tdocument text number {i} about topic {i % 3}\n"
                for i in range(8)))
    (tmp_path / "queries").mkdir()
    (tmp_path / "queries" / "raw.tsv").write_text(
        "".join(f"q{i}\tquery about topic {i % 3}\n" for i in range(4)))
    return Collection(tmp_path / "docs"), Collection(tmp_path / "queries")


def test_build_and_load_bce_examples(tmp_path, tiny_corpus):
    docs, queries = tiny_corpus
    qrel = {"q0": {"d0": 1}, "q1": {"d1": 1, "d2": 0}}
    run = {"q0": {f"d{i}": 1.0 for i in range(8)},
           "q1": {f"d{i}": 1.0 for i in range(8)}}
    rows = build_bce_examples(qrel, run, neg_sample=3, seed=1)
    # q0: 1 rel * 3 negs * 2 rows; q1: only d1 has rel>0 -> 6 rows
    assert len(rows) == 12
    assert sum(l for _, _, l in rows) == 6  # half positives
    path = tmp_path / "bce.tsv"
    save_bce_examples(path, rows)
    ex = BceExamples(path)
    assert len(ex) == 12 and ex[0][2] in (0, 1)


def test_bce_collators_and_iterator(tmp_path, tiny_corpus):
    docs, queries = tiny_corpus
    rows = [("q0", "d0", 1), ("q1", "d1", 0), ("q2", "d2", 1), ("q3", "d3", 0)]
    path = tmp_path / "bce.tsv"
    save_bce_examples(path, rows)
    ex = BceExamples(path)
    tok = HashTokenizer(500)

    bert_coll = BertBceCollator(tok, queries, docs, max_length=24)
    batch = bert_coll([ex[i] for i in range(4)])
    assert batch["input_ids"].shape == (4, 24)
    assert batch["token_type_ids"].max() == 1          # doc segment marked
    assert (batch["token_type_ids"] * (1 - batch["attention_mask"])).sum() == 0
    np.testing.assert_array_equal(batch["labels"], [1, 0, 1, 0])

    d2c = {f"d{i}": np.full((4,), i, np.int32) for i in range(8)}
    t5_coll = T5SeqBceCollator(tok, queries, d2c, max_length=16)
    batch = t5_coll([ex[i] for i in range(4)])
    assert batch["codes"].shape == (4, 4)
    assert batch["codes"][2, 0] == 2

    # iterator start_batch fast-resume: identical stream suffix
    full = list(batches_from_bce(ex, t5_coll, 2, seed=3, epochs=2))
    tail = list(batches_from_bce(ex, t5_coll, 2, seed=3, epochs=2,
                                 start_batch=2))
    assert len(full) - len(tail) == 2
    for a, b in zip(full[2:], tail):
        np.testing.assert_array_equal(a["codes"], b["codes"])


def test_train_t5seq_bce_through_trainer(tiny_corpus):
    """t5seq_bce is registered and trains T5SeqCrossEncoder through the
    generic Trainer (reference loss whitelist arguments.py:100; upstream
    main.py NotImplementedError — this closes that gap)."""
    from ripor_tpu.models.cross_encoder import T5SeqCrossEncoder

    cfg = ripor_small(M=4, K=16)
    model = T5SeqCrossEncoder(cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 100, (4, 8)), jnp.int32)
    batch = {"query_ids": ids, "query_mask": jnp.ones_like(ids),
             "codes": jnp.asarray(rng.integers(0, 16, (4, 4)), jnp.int32),
             "labels": jnp.asarray([1.0, 0.0, 1.0, 0.0])}
    params = model.init({"params": jax.random.PRNGKey(0)}, ids,
                        jnp.ones_like(ids), batch["codes"])["params"]
    tcfg = TrainConfig(loss_type="t5seq_bce", learning_rate=5e-3)
    trainer = Trainer(model, tcfg, params)
    state, metrics = trainer.run([batch] * 25, jax.random.PRNGKey(1))
    assert float(metrics["cls"]) < 0.4, float(metrics["cls"])


def test_train_bert_bce_through_trainer():
    from ripor_tpu.models.cross_encoder import BertCrossEncoder

    model = BertCrossEncoder(vocab_size=120, d_model=32, num_layers=2,
                             num_heads=4, d_ff=64, max_position=32)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(5, 120, (4, 12)), jnp.int32)
    batch = {"input_ids": ids, "attention_mask": jnp.ones_like(ids),
             "token_type_ids": jnp.zeros_like(ids),
             "labels": jnp.asarray([1.0, 0.0, 0.0, 1.0])}
    params = model.init({"params": jax.random.PRNGKey(0)}, ids,
                        jnp.ones_like(ids))["params"]
    tcfg = TrainConfig(loss_type="bert_bce", learning_rate=5e-3)
    trainer = Trainer(model, tcfg, params)
    state, metrics = trainer.run([batch] * 25, jax.random.PRNGKey(1))
    assert float(metrics["cls"]) < 0.4, float(metrics["cls"])


def test_train_dense_margin_mse_through_trainer():
    """margin_mse/kldiv (T5ModelEncoder baselines) drive the Trainer
    (reference t5model_encoder.py:36-99)."""
    from ripor_tpu.models.dense_encoder import T5DenseEncoder

    cfg = ripor_small(M=4, K=8)
    model = T5DenseEncoder(cfg.t5)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 100, (4, 8)), jnp.int32)
    mask = jnp.ones_like(ids)
    batch = {"query_ids": ids, "query_mask": mask,
             "pos_doc_ids": ids, "pos_doc_mask": mask,
             "neg_doc_ids": ids[::-1], "neg_doc_mask": mask,
             "teacher_pos_score": jnp.ones(4) * 3,
             "teacher_neg_score": jnp.zeros(4)}
    params = model.init({"params": jax.random.PRNGKey(0)}, ids, mask)["params"]
    for loss_type in ("margin_mse", "kldiv"):
        trainer = Trainer(model, TrainConfig(loss_type=loss_type,
                                             learning_rate=1e-3), params)
        state, metrics = trainer.run([batch] * 6, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["rank"]))


def test_groups_to_rankdata_no_zero_leakage():
    """The flywheel guarantee: every (q, prefix, doc) carries a true teacher
    score — missing scores raise instead of silently defaulting to 0.0
    (VERDICT round-1 Missing #2)."""
    from ripor_tpu.pipeline.datagen import groups_to_rankdata, union_docid_groups

    d_r = {"q0": {"1_2": ["d0", "d1"]}}
    d_b = {"q0": {"1_2": ["d1", "d2"], "3_4": ["d3"]}}
    union = union_docid_groups(d_r, d_b)
    assert union["q0"]["1_2"] == ["d0", "d1", "d2"]
    assert union["q0"]["3_4"] == ["d3"]

    scores = {"q0": {"d0": 1.0, "d1": 3.0, "d2": 2.0, "d3": 0.5}}
    rd = groups_to_rankdata(union, scores)
    assert rd["q0"]["1_2"] == [["d1", 3.0], ["d2", 2.0], ["d0", 1.0]]

    with pytest.raises(KeyError):
        groups_to_rankdata({"q0": {"1_2": ["dX"]}}, scores)
    with pytest.raises(KeyError):
        groups_to_rankdata({"qX": {"1_2": ["d0"]}}, scores)


def test_self_rerank_pair_scores(tiny_corpus):
    """Self-teacher pair scoring == RiporModel.rerank_score on each pair."""
    from ripor_tpu.evaluation.reranker import self_rerank_pair_scores
    from ripor_tpu.models import RiporModel

    docs, queries = tiny_corpus
    cfg = ripor_small(M=4, K=16)
    model = RiporModel(cfg)
    rng = np.random.default_rng(0)
    ids0 = jnp.ones((1, 8), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids0, ids0,
                        jnp.zeros((1, 4), jnp.int32))["params"]
    d2c = {f"d{i}": rng.integers(0, 16, 4).astype(np.int32) for i in range(8)}
    tok = HashTokenizer(500)
    pairs = [("q0", "d0"), ("q0", "d3"), ("q1", "d2")]
    out = self_rerank_pair_scores(cfg, params, tok, queries, d2c, pairs,
                                  batch_size=2, max_length=12,
                                  dtype=jnp.float32)
    assert set(out) == {"q0", "q1"} and set(out["q0"]) == {"d0", "d3"}

    from ripor_tpu.data.tokenizer import tokenize_queries
    ids, mask = tokenize_queries(tok, [queries["q0"]], 12)
    want = model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask),
                       jnp.asarray(d2c["d0"])[None],
                       method=RiporModel.rerank_score)
    np.testing.assert_allclose(out["q0"]["d0"], float(want[0]), rtol=1e-5)


def test_bert_teacher_roundtrip(tmp_path, tiny_corpus):
    """Save a BertCrossEncoder checkpoint + geometry, reload via
    load_bert_teacher, score pairs through rerank_pairs."""
    import json

    from ripor_tpu.evaluation.reranker import load_bert_teacher, rerank_pairs
    from ripor_tpu.train import save_params

    docs, queries = tiny_corpus
    tok = HashTokenizer(500)
    geo = dict(d_model=32, num_layers=2, num_heads=4, d_ff=64, max_position=64)
    from ripor_tpu.models.cross_encoder import BertCrossEncoder
    ce = BertCrossEncoder(vocab_size=tok.vocab_size, **geo)
    ids0 = jnp.ones((1, 8), jnp.int32)
    params = ce.init({"params": jax.random.PRNGKey(0)}, ids0, ids0)["params"]
    ckpt = tmp_path / "teacher"
    save_params(ckpt, params)
    (ckpt / "bert_geometry.json").write_text(json.dumps(geo))

    score_fn = load_bert_teacher(str(ckpt), tok.vocab_size)
    run = rerank_pairs(score_fn, tok, queries, docs,
                       [("q0", "d0"), ("q0", "d1")], batch_size=2,
                       max_length=24)
    assert set(run["q0"]) == {"d0", "d1"}
    assert all(np.isfinite(v) for v in run["q0"].values())


def test_bert_teacher_token_types_match_training_convention(tiny_corpus):
    """load_bert_teacher derives token_type_ids from the [SEP] position;
    its scores must equal applying the model with the BertBceCollator's
    types (doc segment + EOS = 1) — a zero-types apply would be a
    train/serve input skew."""
    from ripor_tpu.data.collators import BertBceCollator
    from ripor_tpu.evaluation.reranker import encode_pairs, load_bert_teacher
    from ripor_tpu.models.cross_encoder import BertCrossEncoder
    from ripor_tpu.train import save_params

    docs, queries = tiny_corpus
    tok = HashTokenizer(500)
    geo = dict(d_model=32, num_layers=2, num_heads=4, d_ff=64, max_position=64)
    ce = BertCrossEncoder(vocab_size=tok.vocab_size, **geo)
    ids0 = jnp.ones((1, 8), jnp.int32)
    params = ce.init({"params": jax.random.PRNGKey(1)}, ids0, ids0)["params"]
    import json as _json
    import tempfile
    from pathlib import Path
    with tempfile.TemporaryDirectory() as td:
        ckpt = Path(td) / "t"
        save_params(ckpt, params)
        (ckpt / "bert_geometry.json").write_text(_json.dumps(geo))
        score_fn = load_bert_teacher(str(ckpt), tok.vocab_size)

        coll = BertBceCollator(tok, queries, docs, max_length=24)
        batch = coll([("q0", "d0", 1), ("q1", "d1", 0)])
        want = np.asarray(ce.apply(
            {"params": params}, jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["attention_mask"]),
            jnp.asarray(batch["token_type_ids"]), deterministic=True))
        ids, mask = encode_pairs(tok, [queries["q0"], queries["q1"]],
                                 [docs["d0"], docs["d1"]], 24)
        np.testing.assert_array_equal(ids, batch["input_ids"])
        got = score_fn(ids, mask)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        # and differ from the zero-types apply (the old skewed path)
        skew = np.asarray(ce.apply(
            {"params": params}, jnp.asarray(ids), jnp.asarray(mask),
            deterministic=True))
        assert not np.allclose(skew, want, rtol=1e-5, atol=1e-5)
