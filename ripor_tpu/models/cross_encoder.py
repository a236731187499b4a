"""Cross-encoder teachers.

Two teacher families, mirroring the reference (modeling/cross_encoder.py):

* ``BertCrossEncoder`` — BERT-style (query, doc) pair scorer with a CLS
  classification head (reference CrossEncoder :7-37 wraps the pretrained
  MiniLM cross-encoder; this image has no pretrained weights, so the
  architecture is provided from scratch for in-framework training or for
  loading converted weights).
* ``T5SeqCrossEncoder`` — the RIPOR backbone scoring (query, smtid) pairs:
  decoder hidden states over the smtid positions, mean-pooled into a tanh
  classification head (reference :39-106; trained with BCE, the
  ``t5seq_bce`` loss).
"""
from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp

from ripor_tpu.models.config import RiporConfig, T5Config
from ripor_tpu.models.layers import Attention, padding_bias
from ripor_tpu.models.ripor import RiporModel


class BertLayer(nn.Module):
    """Post-norm transformer encoder layer (BERT convention)."""

    d_model: int
    num_heads: int
    d_ff: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias, deterministic: bool = True):
        cfg = T5Config(d_model=self.d_model, d_kv=self.d_model // self.num_heads,
                       num_heads=self.num_heads, d_ff=self.d_ff,
                       dropout_rate=self.dropout)
        h = Attention(cfg, dtype=self.dtype)(x, bias=bias)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype)(x + h)
        h = nn.Dense(self.d_ff, dtype=self.dtype)(x)
        h = nn.gelu(h)
        h = nn.Dense(self.d_model, dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype)(x + h)


class BertCrossEncoder(nn.Module):
    """(query ++ [SEP] ++ doc) token sequence -> relevance logit [B]."""

    vocab_size: int = 32128
    d_model: int = 384          # MiniLM-L6 geometry by default
    num_layers: int = 6
    num_heads: int = 12
    d_ff: int = 1536
    max_position: int = 512
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids=None,
                 deterministic: bool = True):
        B, L = input_ids.shape
        x = nn.Embed(self.vocab_size, self.d_model, dtype=self.dtype)(input_ids)
        pos = nn.Embed(self.max_position, self.d_model, dtype=self.dtype)(
            jnp.arange(L)[None].repeat(B, 0))
        x = x + pos
        if token_type_ids is not None:
            x = x + nn.Embed(2, self.d_model, dtype=self.dtype)(token_type_ids)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        bias = padding_bias(attention_mask).astype(jnp.float32)
        for _ in range(self.num_layers):
            x = BertLayer(self.d_model, self.num_heads, self.d_ff,
                          self.dropout, self.dtype)(
                x, bias, deterministic=deterministic)
        cls = x[:, 0]
        cls = jnp.tanh(nn.Dense(self.d_model, dtype=self.dtype)(cls))
        return nn.Dense(1, dtype=self.dtype)(cls)[:, 0].astype(jnp.float32)


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
