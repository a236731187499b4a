"""Losses, train step (incl. 8-device CPU mesh + grad accumulation),
checkpoint roundtrip."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ripor_tpu.models import RiporModel, ripor_small
from ripor_tpu.train import (
    TrainConfig,
    Trainer,
    TrainState,
    lng_knp_margin_mse,
    make_optimizer,
    make_train_step,
    margin_mse,
    pretrain_margin_mse,
    seq2seq_ce,
)


def setup(M=8, K=16, B=8, L=12, seed=0):
    cfg = ripor_small(M=M, K=K)
    model = RiporModel(cfg)
    rng = np.random.default_rng(seed)
    ids = jnp.array(rng.integers(1, 100, (B, L)), jnp.int32)
    mask = jnp.ones_like(ids)
    codes = jnp.array(rng.integers(0, K, (B, M)), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(seed)}, ids, mask, codes)["params"]
    return cfg, model, params, ids, mask, codes, rng


def marginmse_batch(ids, mask, codes, rng, m=None):
    m = m or codes.shape[1]
    B = ids.shape[0]
    return {
        "query_ids": ids, "query_mask": mask,
        "pos_codes": codes[:, :m],
        "neg_codes": jnp.array(rng.integers(0, 16, (B, m)), jnp.int32),
        "teacher_pos_score": jnp.array(rng.standard_normal(B), jnp.float32),
        "teacher_neg_score": jnp.array(rng.standard_normal(B), jnp.float32),
    }


def test_margin_mse_finite():
    cfg, model, params, ids, mask, codes, rng = setup()
    out = margin_mse(model, params, marginmse_batch(ids, mask, codes, rng))
    assert set(out) == {"rank"} and np.isfinite(float(out["rank"]))


def test_seq2seq_ce_starts_near_uniform():
    cfg, model, params, ids, mask, codes, rng = setup()
    out = seq2seq_ce(model, params,
                     {"query_ids": ids, "query_mask": mask, "codes": codes})
    # random init with N(0,1) codebooks: CE should be within a few nats of ln(K)
    assert abs(float(out["rank"]) - np.log(cfg.K)) < 30.0
    assert np.isfinite(float(out["rank"]))


@pytest.mark.parametrize("m,expected", [
    (8, {"rank", "rank_4"}),
    (16, {"rank", "rank_4", "rank_8"}),
])
def test_lng_knp_emits_prefix_losses(m, expected):
    cfg, model, params, ids, mask, codes, rng = setup(M=16)
    batch = marginmse_batch(ids, mask, codes, rng, m=m)
    for plen in (4, 8, 16):
        if plen < m:
            batch[f"smtid_{plen}_teacher_pos_score"] = batch["teacher_pos_score"]
            batch[f"smtid_{plen}_teacher_neg_score"] = batch["teacher_neg_score"]
    out = lng_knp_margin_mse(model, params, batch)
    assert set(out) == expected


def test_lng_knp_and_seq2seq_joint_loss():
    """The reference's declared joint config (arguments.py:97,
    t5seq_aq_encoder_lng_knp_margin_mse_and_seq2seq — whitelisted but its
    model class was never shipped): rank(+prefix) losses on the rank keys
    plus codebook CE on the s2s_ sub-batch, one dict the trainer sums."""
    from ripor_tpu.train.losses import (LOSS_FNS,
                                        lng_knp_margin_mse_and_seq2seq)

    cfg, model, params, ids, mask, codes, rng = setup(M=16)
    batch = marginmse_batch(ids, mask, codes, rng, m=16)
    for plen in (4, 8):
        batch[f"smtid_{plen}_teacher_pos_score"] = batch["teacher_pos_score"]
        batch[f"smtid_{plen}_teacher_neg_score"] = batch["teacher_neg_score"]
    batch["s2s_query_ids"] = ids
    batch["s2s_query_mask"] = mask
    batch["s2s_codes"] = codes
    out = lng_knp_margin_mse_and_seq2seq(model, params, batch)
    assert set(out) == {"rank", "rank_4", "rank_8", "seq2seq"}
    assert all(np.isfinite(float(v)) for v in out.values())
    # the seq2seq term equals the standalone CE on the same sub-batch
    ce = seq2seq_ce(model, params, {"query_ids": ids, "query_mask": mask,
                                    "codes": codes})["rank"]
    np.testing.assert_allclose(float(out["seq2seq"]), float(ce), rtol=1e-6)
    assert ("t5seq_aq_encoder_lng_knp_margin_mse_and_seq2seq" in LOSS_FNS)


def test_batches_from_joint_merges_key_sets(tmp_path):
    """batches_from_joint zips rank batches with a cycling fixed-shape
    seq2seq stream under s2s_ prefixes (cycle longer than one s2s epoch)."""
    import json

    from ripor_tpu.data import (Collection, MarginMSECollator,
                                Seq2SeqCollator, Seq2SeqExamples,
                                TeacherScoreExamples, WordTokenizer,
                                batches_from_joint,
                                batches_from_teacher_examples)

    qdir = tmp_path / "queries"; qdir.mkdir()
    with open(qdir / "raw.tsv", "w") as f:
        for i in range(6):
            f.write(f"q{i}\tfind topic {i}\n")
    queries = Collection(str(qdir))
    tok = WordTokenizer.train(["find topic"] + [str(i) for i in range(6)],
                              vocab_size=32)
    rank_path = tmp_path / "rank.jsonl"
    with open(rank_path, "w") as f:
        for i in range(6):
            f.write(json.dumps({"qid": f"q{i}",
                                "smtids": ["1_2_3_4", "2_3_4_5", "3_4_5_6"],
                                "scores": [3.0, 2.0, 1.0]}) + "\n")
    s2s_path = tmp_path / "s2s.jsonl"
    with open(s2s_path, "w") as f:
        for i in range(3):      # smaller than the rank set: must cycle
            f.write(json.dumps({"docid": f"d{i}",
                                "query": f"find topic {i}"}) + "\n")
    d2c = {f"d{i}": np.full(4, i, np.int32) for i in range(3)}
    rank = TeacherScoreExamples(rank_path, smtid_as_docid=True)
    rb = batches_from_teacher_examples(
        rank, MarginMSECollator(tok, queries, None, max_length=8,
                                smtid_as_docid=True), 2, epochs=2,
        drop_last=False)
    batches = list(batches_from_joint(
        rb, Seq2SeqExamples(s2s_path), Seq2SeqCollator(tok, d2c,
                                                       max_length=8), 2))
    assert len(batches) == 6    # 6 rank examples x 2 epochs / bz 2
    for b in batches:
        assert {"query_ids", "pos_codes", "neg_codes",
                "s2s_query_ids", "s2s_query_mask", "s2s_codes"} <= set(b)
        assert b["s2s_codes"].shape == (2, 4)   # fixed shape across cycles


def test_pretrain_margin_mse_with_and_without_prefix():
    cfg, model, params, ids, mask, codes, rng = setup()
    base = {
        "query_ids": ids, "query_mask": mask,
        "pos_doc_ids": ids, "pos_doc_mask": mask,
        "neg_doc_ids": ids[::-1], "neg_doc_mask": mask,
        "teacher_pos_score": jnp.ones(8), "teacher_neg_score": jnp.zeros(8),
    }
    out = pretrain_margin_mse(model, params, base)
    assert set(out) == {"rank"}
    with_prefix = dict(base, pos_prefix_codes=codes[:, :4],
                       neg_prefix_codes=codes[:, :4])
    out2 = pretrain_margin_mse(model, params, with_prefix)
    assert set(out2) == {"rank", "commit"}
    assert np.isfinite(float(out2["commit"]))


def test_train_loss_decreases_seq2seq():
    """Tiny overfit: seq2seq CE on a fixed batch must fall fast."""
    cfg, model, params, ids, mask, codes, rng = setup()
    tcfg = TrainConfig(loss_type="t5seq_aq_encoder_seq2seq",
                       learning_rate=3e-3, total_steps=60)
    tx = make_optimizer(tcfg)
    step = jax.jit(make_train_step(model, tcfg, tx))
    state = TrainState.create(params, tx)
    batch = {"query_ids": ids, "query_mask": mask, "codes": codes}
    key = jax.random.PRNGKey(0)
    first = None
    for i in range(40):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert last < first * 0.5, (first, last)


def test_l2sp_anchor_damps_drift():
    """Decoupled L2-SP spring (trainer.py l2sp_rate): rate 0 leaves the
    update untouched; a strong spring keeps params near the anchor while
    training moves the unsprung run measurably further (the phase-3
    anti-forgetting lever, full_recipe.py phase3_l2sp)."""
    cfg, model, params, ids, mask, codes, rng = setup()
    batch = {"query_ids": ids, "query_mask": mask, "codes": codes}
    anchor = jax.tree.map(jnp.copy, params)

    def drift_after(l2sp_rate, n=25):
        tcfg = TrainConfig(loss_type="t5seq_aq_encoder_seq2seq",
                           learning_rate=3e-3, total_steps=n,
                           l2sp_rate=l2sp_rate)
        tx = make_optimizer(tcfg)
        step = jax.jit(make_train_step(model, tcfg, tx,
                                       anchor_params=anchor))
        state = TrainState.create(params, tx)
        key = jax.random.PRNGKey(0)
        for _ in range(n):
            key, sub = jax.random.split(key)
            state, metrics = step(state, batch, sub)
        import optax
        d = optax.global_norm(jax.tree.map(lambda p, a: p - a,
                                           state.params, anchor))
        return float(d), metrics

    free, m_free = drift_after(0.0)
    sprung, m_sprung = drift_after(0.2)
    assert sprung < 0.5 * free, (sprung, free)
    assert "anchor_drift" not in m_free      # rate 0: spring fully off
    np.testing.assert_allclose(float(m_sprung["anchor_drift"]), sprung,
                               rtol=1e-4)

    # rate 0 with an anchor present must be bit-identical to no anchor
    tcfg = TrainConfig(loss_type="t5seq_aq_encoder_seq2seq",
                       learning_rate=3e-3, total_steps=5)
    tx = make_optimizer(tcfg)
    key = jax.random.PRNGKey(2)
    s_a = jax.jit(make_train_step(model, tcfg, tx, anchor_params=anchor))(
        TrainState.create(params, tx), batch, key)[0]
    s_b = jax.jit(make_train_step(model, tcfg, tx))(
        TrainState.create(params, tx), batch, key)[0]
    for x, y in zip(jax.tree.leaves(s_a.params), jax.tree.leaves(s_b.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_grad_accum_matches_full_batch():
    cfg, model, params, ids, mask, codes, rng = setup(B=8)
    batch = {"query_ids": ids, "query_mask": mask, "codes": codes}
    micro = jax.tree.map(lambda x: x.reshape((2, 4) + x.shape[1:]), batch)

    tcfg1 = TrainConfig(loss_type="t5seq_aq_encoder_seq2seq", grad_accum=1,
                        learning_rate=1e-3)
    tcfg2 = TrainConfig(loss_type="t5seq_aq_encoder_seq2seq", grad_accum=2,
                        learning_rate=1e-3)
    tx1, tx2 = make_optimizer(tcfg1), make_optimizer(tcfg2)
    s1 = TrainState.create(params, tx1)
    s2 = TrainState.create(params, tx2)
    key = jax.random.PRNGKey(1)
    s1, m1 = jax.jit(make_train_step(model, tcfg1, tx1))(s1, batch, key)
    s2, m2 = jax.jit(make_train_step(model, tcfg2, tx2))(s2, micro, key)
    # same data, deterministic model (dropout 0): identical loss & params
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    a = jax.tree.leaves(s1.params)
    b = jax.tree.leaves(s2.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-6)


def test_trainer_on_mesh(mesh8):
    """SPMD train step over the 4x2 (data x model) CPU mesh."""
    cfg, model, params, ids, mask, codes, rng = setup(B=8)
    tcfg = TrainConfig(loss_type="t5seq_aq_encoder_margin_mse",
                       learning_rate=1e-3, total_steps=10)
    trainer = Trainer(model, tcfg, params, mesh=mesh8)
    batches = [marginmse_batch(ids, mask, codes, rng) for _ in range(3)]
    state, metrics = trainer.run(iter(batches), jax.random.PRNGKey(0), log_every=1)
    assert int(state.step) == 3
    assert np.isfinite(float(metrics["loss"]))


def test_trainer_zero_opt_sharding_matches(mesh8):
    """ZeRO-style opt-state sharding: same numerics as the replicated run,
    and Adam moments actually distributed over the 'data' axis."""
    cfg, model, params, ids, mask, codes, rng = setup(B=8)
    batches = [marginmse_batch(ids, mask, codes, rng) for _ in range(3)]
    key = jax.random.PRNGKey(0)

    tcfg = TrainConfig(loss_type="t5seq_aq_encoder_margin_mse",
                       learning_rate=1e-3, total_steps=10)
    t_rep = Trainer(model, tcfg, params, mesh=mesh8)
    s_rep, _ = t_rep.run(iter(batches), key, log_every=10)

    tcfg_z = TrainConfig(loss_type="t5seq_aq_encoder_margin_mse",
                         learning_rate=1e-3, total_steps=10,
                         shard_opt_state=True)
    t_z = Trainer(model, tcfg_z, params, mesh=mesh8)
    s_z, _ = t_z.run(iter(batches), key, log_every=10)

    for a, b in zip(jax.tree.leaves(s_rep.params), jax.tree.leaves(s_z.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
    # at least one large moment leaf must be sharded across 'data'
    sharded = [
        x for x in jax.tree.leaves(s_z.opt_state)
        if hasattr(x, "sharding") and x.ndim >= 1 and x.size >= 64
        and "data" in str(x.sharding)
    ]
    assert sharded, "no opt-state leaf sharded over the data axis"


def test_trainer_periodic_dev_eval():
    """eval_fn fires every eval_steps with the live params and its metrics
    reach the log (reference in-training evaluate(), tasks/trainer.py:870)."""
    cfg, model, params, ids, mask, codes, rng = setup()
    logged = []
    calls = []

    def eval_fn(p):
        calls.append(1)
        return {"dev_mrr_10": 0.5}

    tcfg = TrainConfig(loss_type="t5seq_aq_encoder_seq2seq",
                       learning_rate=1e-3, total_steps=10)
    trainer = Trainer(model, tcfg, params,
                      log_fn=lambda m, s: logged.append((s, m)),
                      eval_fn=eval_fn, eval_steps=2)
    batch = {"query_ids": ids, "query_mask": mask, "codes": codes}
    trainer.run(iter([batch] * 4), jax.random.PRNGKey(0), log_every=1)
    assert len(calls) == 2  # steps 2 and 4
    assert any("dev_mrr_10" in m for _, m in logged)


def test_checkpoint_roundtrip(tmp_path):
    from ripor_tpu.train import load_params, resize_codebooks, save_params
    cfg, model, params, ids, mask, codes, rng = setup()
    save_params(tmp_path / "ck", params, cfg)
    restored = load_params(tmp_path / "ck", like=params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # geometry transform between phases
    resized = resize_codebooks(dict(params), new_M=12, new_K=32)
    assert resized["codebooks"].shape == (12, 32, cfg.t5.d_model)
    np.testing.assert_array_equal(
        resized["codebooks"][:cfg.M, :cfg.K], np.asarray(params["codebooks"]))
