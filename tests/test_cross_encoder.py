"""Cross-encoder teachers + reranking engine."""
import jax
import jax.numpy as jnp
import numpy as np

from ripor_tpu.models.cross_encoder import (
    BertCrossEncoder,
    T5SeqCrossEncoder,
    bce_loss,
)
from ripor_tpu.models import ripor_small


def test_bert_cross_encoder_shapes_and_training():
    model = BertCrossEncoder(vocab_size=200, d_model=32, num_layers=2,
                             num_heads=4, d_ff=64)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(5, 200, (4, 16)), jnp.int32)
    mask = jnp.ones_like(ids)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids, mask)["params"]
    logits = model.apply({"params": params}, ids, mask)
    assert logits.shape == (4,) and logits.dtype == jnp.float32

    # BCE overfit: logits should separate fixed labels
    labels = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    import optax
    tx = optax.adam(5e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            return bce_loss(model.apply({"params": p}, ids, mask), labels)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    first = None
    for i in range(60):
        params, opt_state, loss = step(params, opt_state)
        if first is None:
            first = float(loss)
    assert float(loss) < 0.3 * first, (first, float(loss))


def test_t5seq_cross_encoder():
    cfg = ripor_small(M=4, K=16)
    model = T5SeqCrossEncoder(cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 100, (3, 10)), jnp.int32)
    mask = jnp.ones_like(ids)
    codes = jnp.asarray(rng.integers(0, 16, (3, 4)), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids, mask, codes)["params"]
    logits = model.apply({"params": params}, ids, mask, codes)
    assert logits.shape == (3,)
    assert np.isfinite(np.asarray(logits)).all()


def test_bce_loss_matches_manual():
    logits = jnp.asarray([2.0, -1.0, 0.0])
    labels = jnp.asarray([1.0, 0.0, 1.0])
    import scipy.special
    p = scipy.special.expit(np.asarray(logits))
    want = -np.mean(np.asarray(labels) * np.log(p)
                    + (1 - np.asarray(labels)) * np.log(1 - p))
    np.testing.assert_allclose(float(bce_loss(logits, labels)), want, rtol=1e-6)


def test_rerank_engine(tmp_path):
    from ripor_tpu.data import Collection, HashTokenizer
    from ripor_tpu.evaluation.reranker import (
        add_qrel_positives,
        encode_pairs,
        rerank_pairs,
        rerank_qid_smtid_docids,
    )
    (tmp_path / "docs").mkdir()
    (tmp_path / "docs" / "raw.tsv").write_text("d0\tfoo bar\nd1\tbaz qux\n")
    (tmp_path / "queries").mkdir()
    (tmp_path / "queries" / "raw.tsv").write_text("q0\tfoo\n")
    docs = Collection(tmp_path / "docs")
    queries = Collection(tmp_path / "queries")
    tok = HashTokenizer(500)

    ids, mask = encode_pairs(tok, ["foo"], ["bar baz"], 10)
    assert ids[0, 0] == 3  # CLS
    assert 4 in ids[0]     # SEP

    def fake_score(ids, mask):
        return ids[:, 1].astype(np.float32)  # deterministic pseudo-score

    run = rerank_pairs(fake_score, tok, queries, docs,
                       [("q0", "d0"), ("q0", "d1")], batch_size=2, max_length=10)
    assert set(run["q0"]) == {"d0", "d1"}

    rankdata = rerank_qid_smtid_docids(
        fake_score, tok, queries, docs,
        {"q0": {"1_2": ["d0", "d1"]}}, batch_size=2, max_length=10)
    pairs = rankdata["q0"]["1_2"]
    assert len(pairs) == 2 and pairs[0][1] >= pairs[1][1]

    boosted = add_qrel_positives({"q0": {"d0": 1.0}}, {"q0": {"d1": 1}})
    assert boosted["q0"]["d1"] == 2.0
