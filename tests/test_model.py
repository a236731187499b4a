"""Model unit tests: shapes, decode-step vs full-forward parity, scoring."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ripor_tpu.models import RiporModel, ripor_small
from ripor_tpu.models.layers import relative_position_bucket


def make_model(M=8, K=32):
    cfg = ripor_small(M=M, K=K)
    model = RiporModel(cfg)
    rng = jax.random.PRNGKey(0)
    ids = jnp.array(np.random.default_rng(0).integers(1, 100, (2, 12)), jnp.int32)
    mask = jnp.ones_like(ids)
    codes = jnp.array(np.random.default_rng(1).integers(0, K, (2, M)), jnp.int32)
    params = model.init({"params": rng}, ids, mask, codes)["params"]
    return cfg, model, params, ids, mask, codes


def test_forward_shapes():
    cfg, model, params, ids, mask, codes = make_model()
    hidden = model.apply({"params": params}, ids, mask, codes)
    assert hidden.shape == (2, cfg.M, cfg.t5.d_model)
    logits = model.apply({"params": params}, hidden,
                         method=RiporModel.lm_logits)
    assert logits.shape == (2, cfg.M, cfg.K)
    assert logits.dtype == jnp.float32


def test_rerank_score_matches_manual():
    """score = sum_i <h_i, E_out[i][c_i]> (reference rerank_forward semantics)."""
    cfg, model, params, ids, mask, codes = make_model()
    score = model.apply({"params": params}, ids, mask, codes,
                        method=RiporModel.rerank_score)
    hidden = np.asarray(model.apply({"params": params}, ids, mask, codes))
    books = np.asarray(params["codebooks"])
    manual = sum(
        (hidden[:, i] * books[i][np.asarray(codes)[:, i]]).sum(-1)
        for i in range(cfg.M))
    np.testing.assert_allclose(np.asarray(score), manual, rtol=2e-4)


def test_lm_logits_gather_equals_score():
    """Gathering per-position logits at the doc codes must reproduce the
    sequential dot-product score (model is scorer AND generator)."""
    cfg, model, params, ids, mask, codes = make_model()
    hidden = model.apply({"params": params}, ids, mask, codes)
    logits = model.apply({"params": params}, hidden, method=RiporModel.lm_logits)
    gathered = np.take_along_axis(
        np.asarray(logits), np.asarray(codes)[:, :, None], axis=2)[:, :, 0].sum(-1)
    score = model.apply({"params": params}, ids, mask, codes,
                        method=RiporModel.rerank_score)
    np.testing.assert_allclose(gathered, np.asarray(score), rtol=2e-4)


def test_decode_step_matches_full_forward():
    """Stepwise cached decoding must equal the full (teacher-forced) forward."""
    cfg, model, params, ids, mask, codes = make_model()
    B, N = ids.shape[0], 1

    full_hidden = model.apply({"params": params}, ids, mask, codes)
    full_logits = model.apply({"params": params}, full_hidden,
                              method=RiporModel.lm_logits)

    enc = model.apply({"params": params}, ids, mask, method=RiporModel.encode)
    cross_kv, self_bias, cache = model.apply(
        {"params": params}, enc, B, N, method=RiporModel.decode_prepare)
    enc_bias = jnp.where(mask > 0, 0.0, -1e9)

    step_logits = []
    tokens = jnp.zeros((B, N), jnp.int32)
    for t in range(cfg.M):
        logits, cache, _ = model.apply(
            {"params": params}, tokens, cache, cross_kv, enc_bias, self_bias,
            t, method=RiporModel.decode_step)
        step_logits.append(np.asarray(logits)[:, 0])
        tokens = codes[:, t][:, None]  # teacher-force the reference path
    step_logits = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(step_logits, np.asarray(full_logits),
                               rtol=2e-3, atol=2e-4)


def test_relative_position_bucket_properties():
    rp = jnp.arange(-200, 200)
    bidir = relative_position_bucket(rp, True, 32, 128)
    causal = relative_position_bucket(rp, False, 32, 128)
    assert int(bidir.min()) >= 0 and int(bidir.max()) < 32
    # causal bucketing uses the full bucket budget (no sign split)
    assert int(causal.min()) >= 0 and int(causal.max()) < 32
    assert int(causal[rp >= 0].max()) == 0  # future positions collapse to 0
    # zero distance -> bucket 0; symmetric split for bidirectional
    assert int(relative_position_bucket(jnp.array(0), True, 32, 128)) == 0
    assert int(relative_position_bucket(jnp.array(1), True, 32, 128)) == 17
    assert int(relative_position_bucket(jnp.array(-1), True, 32, 128)) == 1


def test_dense_rep_shapes():
    cfg, model, params, ids, mask, codes = make_model()
    rep = model.apply({"params": params}, ids, mask,
                      method=RiporModel.dense_rep)
    assert rep.shape == (2, cfg.t5.d_model)
    rep2 = model.apply({"params": params}, ids, mask, codes[:, :4],
                       method=RiporModel.dense_rep)
    assert rep2.shape == (2, cfg.t5.d_model)


def test_scaleup_output_hidden_scales_logits():
    """scaleup_output_hidden multiplies the decoder output by d_model**-0.5
    before the lm head (reference t5_generative_retriever.py:427-428)."""
    import dataclasses
    cfg, model, params, ids, mask, codes = make_model()
    cfg_s = dataclasses.replace(cfg, scaleup_output_hidden=True)
    model_s = RiporModel(cfg_s)
    base = model.apply({"params": params}, ids, mask, codes,
                       method=RiporModel.forward_logits)
    scaled = model_s.apply({"params": params}, ids, mask, codes,
                           method=RiporModel.forward_logits)
    np.testing.assert_allclose(np.asarray(scaled),
                               np.asarray(base) * cfg.t5.d_model ** -0.5,
                               rtol=1e-6, atol=1e-6)
