"""Numerical parity of the from-scratch T5 against HF's torch T5.

Builds a randomly-initialized HF T5Model from a local config (no hub
access), converts its weights via models/import_hf, and checks encoder +
decoder outputs match to fp32 tolerance. This is the SURVEY.md §7.3
"from-scratch T5 numerics" risk, discharged.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ripor_tpu.models import RiporConfig, RiporModel, T5Config  # noqa: E402
from ripor_tpu.models.import_hf import hf_t5_to_params  # noqa: E402


@pytest.fixture(scope="module")
def models():
    hf_cfg = transformers.T5Config(
        vocab_size=256, d_model=64, d_kv=16, d_ff=128, num_layers=3,
        num_decoder_layers=3, num_heads=4, relative_attention_num_buckets=32,
        relative_attention_max_distance=128, dropout_rate=0.0,
        feed_forward_proj="relu", is_encoder_decoder=True,
        decoder_start_token_id=0, pad_token_id=0, eos_token_id=1)
    torch.manual_seed(0)
    hf = transformers.T5Model(hf_cfg).eval()

    cfg = RiporConfig(
        t5=T5Config(vocab_size=256, d_model=64, d_kv=16, d_ff=128,
                    num_layers=3, num_decoder_layers=3, num_heads=4,
                    dropout_rate=0.0),
        M=6, K=16)
    model = RiporModel(cfg)
    ids = jnp.ones((2, 10), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids, ids,
                        jnp.zeros((2, 6), jnp.int32))["params"]
    params = hf_t5_to_params(hf.state_dict(), jax.tree.map(np.asarray, params))
    return hf, cfg, model, params


def test_encoder_parity(models):
    hf, cfg, model, params = models
    rng = np.random.default_rng(0)
    ids = rng.integers(2, 256, (2, 12))
    mask = np.ones_like(ids)
    mask[1, 8:] = 0

    with torch.no_grad():
        hf_out = hf.encoder(input_ids=torch.tensor(ids),
                            attention_mask=torch.tensor(mask)
                            ).last_hidden_state.numpy()
    ours = np.asarray(model.apply(
        {"params": params}, jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32), method=RiporModel.encode))
    # padded positions can differ (HF still computes them); compare valid
    np.testing.assert_allclose(ours[0], hf_out[0], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(ours[1, :8], hf_out[1, :8], rtol=2e-4, atol=2e-5)


def test_decoder_parity(models):
    """Full encoder-decoder: feed HF the same per-position embeddings our
    codebook head produces, compare decoder hidden states."""
    hf, cfg, model, params = models
    rng = np.random.default_rng(1)
    ids = rng.integers(2, 256, (2, 12))
    mask = np.ones_like(ids)
    codes = rng.integers(0, cfg.K, (2, cfg.M))

    dec_embeds = np.asarray(model.apply(
        {"params": params}, jnp.asarray(codes, jnp.int32),
        method=RiporModel.decoder_inputs_from_codes))

    with torch.no_grad():
        enc = hf.encoder(input_ids=torch.tensor(ids),
                         attention_mask=torch.tensor(mask)).last_hidden_state
        hf_hidden = hf.decoder(
            inputs_embeds=torch.tensor(dec_embeds),
            encoder_hidden_states=enc,
            encoder_attention_mask=torch.tensor(mask),
        ).last_hidden_state.numpy()

    ours = np.asarray(model.apply(
        {"params": params}, jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32), jnp.asarray(codes, jnp.int32)))
    np.testing.assert_allclose(ours, hf_hidden, rtol=2e-4, atol=2e-5)


def _tiny_bert_cfg(**kw):
    return transformers.BertConfig(
        vocab_size=200, hidden_size=48, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        hidden_act="gelu", pad_token_id=0, **kw)


def test_bert_cross_encoder_parity():
    """BertCrossEncoder == HF BertForSequenceClassification(num_labels=1)
    after hf_bert_to_params — the pretrained-MiniLM teacher import path
    (reference modeling/cross_encoder.py:7-37)."""
    from ripor_tpu.models.cross_encoder import BertCrossEncoder
    from ripor_tpu.models.import_hf import hf_bert_to_params

    torch.manual_seed(0)
    hf = transformers.BertForSequenceClassification(
        _tiny_bert_cfg(num_labels=1)).eval()

    model = BertCrossEncoder(vocab_size=200, d_model=48, num_layers=3,
                             num_heads=4, d_ff=96, max_position=64,
                             dropout=0.0)
    rng = np.random.default_rng(0)
    ids = rng.integers(5, 200, (3, 12))
    mask = np.ones_like(ids)
    mask[2, 9:] = 0
    types = np.zeros_like(ids)
    types[:, 6:] = 1

    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
                        jnp.asarray(types, jnp.int32))["params"]
    params = hf_bert_to_params(hf.state_dict(), jax.tree.map(np.asarray, params))

    with torch.no_grad():
        want = hf(input_ids=torch.tensor(ids),
                  attention_mask=torch.tensor(mask),
                  token_type_ids=torch.tensor(types)).logits[:, 0].numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(ids, jnp.int32),
                                 jnp.asarray(mask, jnp.int32),
                                 jnp.asarray(types, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_bert_dense_encoder_parity():
    """BertDenseEncoder CLS rep == HF BertModel last_hidden_state[:, 0]
    (reference modeling/dense_encoder.py:5-11)."""
    from ripor_tpu.models.dense_encoder import BertDenseEncoder
    from ripor_tpu.models.import_hf import hf_bert_to_params

    torch.manual_seed(1)
    hf = transformers.BertModel(_tiny_bert_cfg()).eval()
    model = BertDenseEncoder(vocab_size=200, d_model=48, num_layers=3,
                             num_heads=4, d_ff=96, max_position=64,
                             dropout=0.0)
    rng = np.random.default_rng(1)
    ids = rng.integers(5, 200, (2, 10))
    mask = np.ones_like(ids)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.asarray(ids, jnp.int32),
                        jnp.asarray(mask, jnp.int32))["params"]
    params = hf_bert_to_params(hf.state_dict(), jax.tree.map(np.asarray, params))
    with torch.no_grad():
        want = hf(input_ids=torch.tensor(ids),
                  attention_mask=torch.tensor(mask)
                  ).last_hidden_state[:, 0].numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(ids, jnp.int32),
                                 jnp.asarray(mask, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_gated_v11_import():
    """v1.1 gated-gelu FFN import path."""
    hf_cfg = transformers.T5Config(
        vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, dropout_rate=0.0,
        feed_forward_proj="gated-gelu", decoder_start_token_id=0)
    torch.manual_seed(1)
    hf = transformers.T5Model(hf_cfg).eval()
    cfg = RiporConfig(
        t5=T5Config(vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                    num_decoder_layers=2, num_heads=4, dropout_rate=0.0,
                    feed_forward_proj="gated-gelu"),
        M=4, K=8)
    model = RiporModel(cfg)
    ids = jnp.ones((1, 6), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids, ids,
                        jnp.zeros((1, 4), jnp.int32))["params"]
    params = hf_t5_to_params(hf.state_dict(), jax.tree.map(np.asarray, params))
    rng = np.random.default_rng(2)
    ids = rng.integers(2, 128, (1, 6))
    mask = np.ones_like(ids)
    with torch.no_grad():
        hf_out = hf.encoder(input_ids=torch.tensor(ids),
                            attention_mask=torch.tensor(mask)
                            ).last_hidden_state.numpy()
    ours = np.asarray(model.apply(
        {"params": params}, jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32), method=RiporModel.encode))
    np.testing.assert_allclose(ours, hf_out, rtol=2e-4, atol=2e-5)
