"""Cross-encoder teachers.

Two teacher families, mirroring the reference (modeling/cross_encoder.py):

* ``BertCrossEncoder`` — BERT-style (query, doc) pair scorer with a pooled
  CLS classification head (reference CrossEncoder :7-37 wraps a pretrained
  MiniLM BertForSequenceClassification; this architecture is numerically
  HF-parity so converted pretrained weights load via
  models/import_hf.py::hf_bert_to_params, and it is trainable in-framework
  with the ``bert_bce`` loss).
* ``T5SeqCrossEncoder`` — the RIPOR backbone scoring (query, smtid) pairs:
  decoder hidden states over the smtid positions, mean-pooled into a tanh
  classification head (reference :39-106; trained with BCE, the
  ``t5seq_bce`` loss).
"""
from __future__ import annotations


import flax.linen as nn
import jax.numpy as jnp

from ripor_tpu.models.bert import BertBackbone, BertConfig
from ripor_tpu.models.config import RiporConfig
from ripor_tpu.models.ripor import RiporModel


class BertCrossEncoder(nn.Module):
    """(query ++ [SEP] ++ doc) token sequence -> relevance logit [B].

    HF BertForSequenceClassification(num_labels=1) semantics: backbone ->
    pooler (dense+tanh on CLS) -> dropout -> classifier. MiniLM-L6 geometry
    by default (the reference teacher, cross_encoder.py:7-37)."""

    vocab_size: int = 32128
    d_model: int = 384
    num_layers: int = 6
    num_heads: int = 12
    d_ff: int = 1536
    max_position: int = 512
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids=None,
                 deterministic: bool = True):
        cfg = BertConfig(vocab_size=self.vocab_size, d_model=self.d_model,
                         num_layers=self.num_layers, num_heads=self.num_heads,
                         d_ff=self.d_ff, max_position=self.max_position,
                         dropout=self.dropout)
        x = BertBackbone(cfg, dtype=self.dtype, name="bert")(
            input_ids, attention_mask, token_type_ids,
            deterministic=deterministic)
        cls = jnp.tanh(nn.Dense(self.d_model, dtype=self.dtype,
                                name="pooler")(x[:, 0]))
        cls = nn.Dropout(self.dropout)(cls, deterministic=deterministic)
        return nn.Dense(1, dtype=self.dtype,
                        name="classifier")(cls)[:, 0].astype(jnp.float32)


class T5ClassificationHead(nn.Module):
    """dense -> tanh -> out_proj (reference :39-54)."""

    d_model: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = jnp.tanh(nn.Dense(self.d_model, dtype=self.dtype)(x))
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(1, dtype=self.dtype)(x)[:, 0].astype(jnp.float32)


class T5SeqCrossEncoder(nn.Module):
    """(query tokens, smtid codes) -> relevance logit [B] (reference :57-92:
    mean-pool decoder hidden over smtid positions into the head)."""

    cfg: RiporConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.base = RiporModel(self.cfg, dtype=self.dtype, name="base")
        self.head = T5ClassificationHead(self.cfg.t5.d_model,
                                         self.cfg.t5.dropout_rate,
                                         self.dtype, name="head")

    def __call__(self, input_ids, attention_mask, codes,
                 deterministic: bool = True):
        hidden = self.base(input_ids, attention_mask, codes,
                           deterministic=deterministic)   # [B, m, d]
        return self.head(jnp.mean(hidden, axis=1), deterministic=deterministic)


def bce_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """BCEWithLogits (reference cls_loss): mean over batch."""
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    return jnp.mean(jnp.maximum(logits, 0) - logits * labels
                    + jnp.log1p(jnp.exp(-jnp.abs(logits))))
