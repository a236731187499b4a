"""From-scratch BERT trunk with HF weight-import parity.

The reference's cross-encoder teacher wraps a *pretrained* HF
BertForSequenceClassification (MiniLM; /root/reference/t5_pretrainer/modeling/
cross_encoder.py:7-37) and its dense baseline wraps AutoModel CLS pooling
(modeling/dense_encoder.py:5-11). Matching that capability requires exact
BERT numerics — biased QKV projections with the 1/sqrt(d_head) scale,
post-norm residuals with biased LayerNorm (eps 1e-12), learned absolute
position + token-type embeddings, and erf-gelu — so converted HF weights
(models/import_hf.py::hf_bert_to_params) reproduce torch outputs.

Layout is TPU-friendly: one fused [B, L, 3*inner] QKV matmul would not help
here (XLA fuses the three anyway); attention runs in the model dtype with
fp32 softmax accumulation like the T5 stack.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from ripor_tpu.models.layers import NEG_INF


@dataclasses.dataclass(frozen=True)
class BertConfig:
    """Geometry of a BERT-family encoder (HF BertConfig subset).

    Defaults are MiniLM-L6 (the reference's cross-encoder teacher,
    cross-encoder/ms-marco-MiniLM-L-6-v2)."""

    vocab_size: int = 30522
    d_model: int = 384
    num_layers: int = 6
    num_heads: int = 12
    d_ff: int = 1536
    max_position: int = 512
    type_vocab_size: int = 2
    dropout: float = 0.1
    layer_norm_eps: float = 1e-12

    @classmethod
    def minilm_l6(cls) -> "BertConfig":
        return cls()

    @classmethod
    def bert_base(cls) -> "BertConfig":
        return cls(d_model=768, num_layers=12, num_heads=12, d_ff=3072)


class BertSelfAttention(nn.Module):
    """Scaled dot-product MHA with biased projections (HF BertSelfAttention
    + BertSelfOutput dense, without the residual/LN which live in BertLayer)."""

    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias):
        cfg = self.cfg
        d_head = cfg.d_model // cfg.num_heads
        dense = lambda name: nn.Dense(cfg.d_model, use_bias=True,
                                      dtype=self.dtype, name=name)
        B, L, _ = x.shape
        split = lambda t: t.reshape(B, L, cfg.num_heads, d_head)
        q = split(dense("q")(x)) / jnp.asarray(d_head ** 0.5, self.dtype)
        k = split(dense("k")(x))
        v = split(dense("v")(x))
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores + bias.astype(jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        return dense("o")(attn.reshape(B, L, cfg.d_model))


class BertLayer(nn.Module):
    """Post-norm transformer encoder layer (BERT convention; HF BertLayer)."""

    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias, deterministic: bool = True):
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                       dtype=self.dtype, name=name)
        h = BertSelfAttention(cfg, dtype=self.dtype, name="attn")(x, bias)
        h = nn.Dropout(cfg.dropout)(h, deterministic=deterministic)
        x = ln("attn_norm")(x + h)
        h = nn.Dense(cfg.d_ff, dtype=self.dtype, name="ffn_wi")(x)
        h = nn.gelu(h, approximate=False)  # HF BERT uses exact (erf) gelu
        h = nn.Dense(cfg.d_model, dtype=self.dtype, name="ffn_wo")(h)
        h = nn.Dropout(cfg.dropout)(h, deterministic=deterministic)
        return ln("ffn_norm")(x + h)


class BertBackbone(nn.Module):
    """Embeddings + encoder stack -> last hidden states [B, L, d].

    Mirrors HF BertModel minus the pooler (pooler lives in the heads that
    need it). token_type_ids default to zeros (single-segment)."""

    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids=None,
                 deterministic: bool = True):
        cfg = self.cfg
        B, L = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=self.dtype,
                     name="word")(input_ids)
        x = x + nn.Embed(cfg.max_position, cfg.d_model, dtype=self.dtype,
                         name="position")(jnp.arange(L)[None])
        x = x + nn.Embed(cfg.type_vocab_size, cfg.d_model, dtype=self.dtype,
                         name="type")(token_type_ids)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="emb_norm")(x)
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)
        bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, NEG_INF)
        for i in range(cfg.num_layers):
            x = BertLayer(cfg, dtype=self.dtype, name=f"layer_{i}")(
                x, bias, deterministic=deterministic)
        return x
