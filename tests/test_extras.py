"""Dense baselines, PQ, dev-eval, first_smtid, observability."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ripor_tpu.models import ripor_small
from ripor_tpu.models.config import T5Config
from ripor_tpu.models.dense_encoder import (
    BertDenseEncoder,
    T5DenseEncoder,
    t5_dense_kldiv,
    t5_dense_margin_mse,
)
from ripor_tpu.quantize.pq import pq_decode, pq_encode, train_pq


def small_t5():
    return T5Config(vocab_size=200, d_model=32, d_kv=8, d_ff=64,
                    num_layers=2, num_decoder_layers=2, num_heads=4,
                    dropout_rate=0.0)


def test_t5_dense_encoder_and_losses():
    cfg = small_t5()
    model = T5DenseEncoder(cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 200, (4, 8)), jnp.int32)
    mask = jnp.ones_like(ids)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids, mask)["params"]
    rep = model.apply({"params": params}, ids, mask)
    assert rep.shape == (4, 32)
    batch = {"query_ids": ids, "query_mask": mask,
             "pos_doc_ids": ids, "pos_doc_mask": mask,
             "neg_doc_ids": ids[::-1], "neg_doc_mask": mask,
             "teacher_pos_score": jnp.ones(4), "teacher_neg_score": jnp.zeros(4)}
    out = t5_dense_margin_mse(model, params, batch)
    assert np.isfinite(float(out["rank"]))
    out2 = t5_dense_kldiv(model, params, batch)
    assert np.isfinite(float(out2["rank"])) and float(out2["rank"]) >= 0


def test_bert_dense_encoder():
    model = BertDenseEncoder(vocab_size=100, d_model=32, num_layers=2,
                             num_heads=4, d_ff=64)
    ids = jnp.ones((2, 6), jnp.int32)
    mask = jnp.ones_like(ids)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids, mask)["params"]
    assert model.apply({"params": params}, ids, mask).shape == (2, 32)


def test_pq_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((500, 32)).astype(np.float32)
    books = train_pq(x, M=4, K=16, kmeans_iters=10)
    codes = pq_encode(books, x)
    assert codes.shape == (500, 4) and codes.max() < 16
    recon = pq_decode(books, codes)
    mse_pq = np.mean(np.sum((x - recon) ** 2, -1))
    assert mse_pq < np.mean(np.sum(x ** 2, -1))  # better than zero codebook


def test_dev_eval_and_first_smtid():
    from ripor_tpu.evaluation.dev_eval import dev_eval, first_smtid
    from ripor_tpu.models import RiporModel

    cfg = ripor_small(M=4, K=8)
    model = RiporModel(cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 100, (4, 6)), jnp.int32)
    mask = jnp.ones_like(ids)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids, mask,
                        jnp.zeros((4, 4), jnp.int32))["params"]
    targets = rng.integers(0, 8, (4, 4))
    out = dev_eval(cfg, params, [(np.asarray(ids), np.asarray(mask))],
                   targets, num_beams=4)
    assert 0.0 <= out["dev_mrr_10"] <= 1.0
    f = first_smtid(cfg, params, np.asarray(ids), np.asarray(mask))
    assert f.shape == (4,) and f.max() < 8
    # first_smtid must equal the argmax of the beam's first step
    from ripor_tpu.decode import beam_search
    bs = beam_search(cfg, params, np.asarray(ids), np.asarray(mask),
                     trie=None, num_beams=1, dtype=jnp.float32)
    np.testing.assert_array_equal(f, bs.codes[:, 0, 0])


def test_dev_eval_multi_positive():
    """Multi-positive qrels: a query whose SECOND-ranked beam is one of two
    positives scores mrr 1/2 and recall 1/2 (reference evaluate() scores the
    run against the full qrel, tasks/trainer.py:930-965)."""
    from ripor_tpu.decode import beam_search
    from ripor_tpu.evaluation.dev_eval import dev_eval
    from ripor_tpu.models import RiporModel

    cfg = ripor_small(M=4, K=8)
    model = RiporModel(cfg)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(1, 100, (2, 6)), jnp.int32)
    mask = jnp.ones_like(ids)
    params = model.init({"params": jax.random.PRNGKey(1)}, ids, mask,
                        jnp.zeros((2, 4), jnp.int32))["params"]
    # oracle targets: take the model's own beams so ranks are known
    bs = beam_search(cfg, params, np.asarray(ids), np.asarray(mask),
                     trie=None, num_beams=4, dtype=jnp.float32)
    # q0: positives = {beam1, unreachable} -> rr 1/2, recall 1/2
    # q1: positives = {beam0}              -> rr 1, recall 1
    unreachable = np.full((4,), 7, np.int64)
    targets = [np.stack([bs.codes[0, 1], unreachable]),
               bs.codes[1, 0][None]]
    out = dev_eval(cfg, params, [(np.asarray(ids), np.asarray(mask))],
                   targets, num_beams=4)
    assert out["dev_mrr_10"] == pytest.approx((0.5 + 1.0) / 2)
    assert out["dev_recall_10"] == pytest.approx((0.5 + 1.0) / 2)


def test_observability():
    import time
    from ripor_tpu.utils import MetricsLogger, StepTimer
    t = StepTimer(warmup=1, flops_per_step=1e9)
    for _ in range(4):
        with t:
            time.sleep(0.01)
    s = t.summary()
    assert s["steps"] == 3 and 0 < s["mfu"] < 1
    import tempfile, json, pathlib
    with tempfile.TemporaryDirectory() as d:
        log = MetricsLogger(pathlib.Path(d) / "m.jsonl")
        log({"loss": 1.0}, step=5)
        rec = json.loads((pathlib.Path(d) / "m.jsonl").read_text())
        assert rec["loss"] == 1.0 and rec["step"] == 5
