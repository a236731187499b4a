"""Dense-encoder baselines.

* ``T5DenseEncoder`` — plain T5 dense encoder: rep = decoder hidden at
  position 0 given a learned start embedding (reference T5ModelEncoder,
  modeling/t5model_encoder.py:11-99, incl. MarginMSE/KLDiv training losses).
* ``BertDenseEncoder`` — BERT-style CLS encoder (reference DenseEncoder,
  modeling/dense_encoder.py:5-11).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ripor_tpu.models.bert import BertBackbone, BertConfig
from ripor_tpu.models.config import T5Config
from ripor_tpu.models.t5 import Decoder, Encoder


class T5DenseEncoder(nn.Module):
    cfg: T5Config
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.shared = nn.Embed(self.cfg.vocab_size, self.cfg.d_model,
                               embedding_init=nn.initializers.normal(1.0),
                               dtype=self.dtype, name="shared")
        self.encoder = Encoder(self.cfg, dtype=self.dtype, name="encoder")
        self.decoder = Decoder(self.cfg, dtype=self.dtype, name="decoder")
        self.start_embed = self.param("start_embed",
                                      nn.initializers.normal(1.0),
                                      (self.cfg.d_model,))

    def __call__(self, input_ids, attention_mask, deterministic: bool = True):
        enc = self.encoder(self.shared(input_ids), attention_mask,
                           deterministic=deterministic)
        start = jnp.broadcast_to(
            jnp.asarray(self.start_embed, self.dtype)[None, None, :],
            (input_ids.shape[0], 1, self.cfg.d_model))
        hidden = self.decoder(start, enc, attention_mask,
                              deterministic=deterministic)
        return hidden[:, 0, :]


def t5_dense_margin_mse(model, params, batch, train: bool = True, rng=None):
    """MarginMSE for the dense baseline (reference t5model_encoder.py:36-62)."""
    rngs = {"dropout": rng} if (train and rng is not None) else {}
    det = not train

    def rep(ids, mask):
        return model.apply({"params": params}, ids, mask,
                           deterministic=det, rngs=rngs).astype(jnp.float32)

    q = rep(batch["query_ids"], batch["query_mask"])
    pd = rep(batch["pos_doc_ids"], batch["pos_doc_mask"])
    nd = rep(batch["neg_doc_ids"], batch["neg_doc_mask"])
    margin = jnp.sum(q * pd, -1) - jnp.sum(q * nd, -1)
    teacher = (batch["teacher_pos_score"] - batch["teacher_neg_score"]).astype(jnp.float32)
    return {"rank": jnp.mean((margin - teacher) ** 2)}


def t5_dense_kldiv(model, params, batch, train: bool = True, rng=None):
    """KLDiv variant over (pos, neg) score distributions vs teacher
    (reference T5ModelEncoderForKLDiv, t5model_encoder.py:64-99)."""
    rngs = {"dropout": rng} if (train and rng is not None) else {}
    det = not train

    def rep(ids, mask):
        return model.apply({"params": params}, ids, mask,
                           deterministic=det, rngs=rngs).astype(jnp.float32)

    q = rep(batch["query_ids"], batch["query_mask"])
    pd = rep(batch["pos_doc_ids"], batch["pos_doc_mask"])
    nd = rep(batch["neg_doc_ids"], batch["neg_doc_mask"])
    student = jnp.stack([jnp.sum(q * pd, -1), jnp.sum(q * nd, -1)], axis=1)
    teacher = jnp.stack([batch["teacher_pos_score"],
                         batch["teacher_neg_score"]], axis=1).astype(jnp.float32)
    s_logp = jax.nn.log_softmax(student, axis=1)
    t_p = jax.nn.softmax(teacher, axis=1)
    return {"rank": jnp.mean(jnp.sum(t_p * (jnp.log(t_p + 1e-9) - s_logp), axis=1))}


class BertDenseEncoder(nn.Module):
    """CLS-pooled BERT-style encoder (reference dense_encoder.py:5-11:
    AutoModel last_hidden_state[:, 0]). HF-parity backbone — pretrained
    BERT weights load via import_hf.hf_bert_to_params."""

    vocab_size: int = 32128
    d_model: int = 768
    num_layers: int = 12
    num_heads: int = 12
    d_ff: int = 3072
    max_position: int = 512
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask, deterministic: bool = True):
        cfg = BertConfig(vocab_size=self.vocab_size, d_model=self.d_model,
                         num_layers=self.num_layers, num_heads=self.num_heads,
                         d_ff=self.d_ff, max_position=self.max_position,
                         dropout=self.dropout)
        x = BertBackbone(cfg, dtype=self.dtype, name="bert")(
            input_ids, attention_mask, deterministic=deterministic)
        return x[:, 0]
