"""RiporModel — the generative retriever (flagship model).

Capability parity with the reference's ``T5ForDocIDGeneration`` family
(modeling/t5_generative_retriever.py:70-1019), re-designed TPU-first:

* the reference's per-position ``nn.Embedding`` ModuleList
  (``list_decoder_embeds``/``list_output_embeds``, :103-109) is a single
  ``[M, K, d]`` codebook tensor, so per-position loops (:250-262 get_lm_logits,
  :811-830 decode, :976-996 get_seq_logits) become one einsum/gather over the
  position axis — the natural MXU formulation;
* decoder-input construction (:194-214 get_decoder_inputs_embeds) is a single
  take_along_axis gather with a shift-right;
* dense-encoder mode (phase 1; T5DocIDGenEncoder.encode :534-543) and
  sequential-dot scoring (T5SeqAQEncoder.rerank_forward :794-798) are methods
  on the same module.

smtid convention: the reference carries a leading ``-1`` start sentinel
(``[-1, c1..cM]``; asserted all over dataset/dataset.py:376,439,573). Here
smtids are pure code arrays ``[c1..cm]`` (int32 in [0, K)); the start token is
implicit (shift-right inserts the learned start embedding).
"""
from __future__ import annotations


from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ripor_tpu.models.config import RiporConfig
from ripor_tpu.models.t5 import Cache, CrossKV, Decoder, Encoder


class RiporModel(nn.Module):
    cfg: RiporConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    step_attn_impl: str = "xla"   # decode-path self-attention impl; see Decoder

    def setup(self):
        t5 = self.cfg.t5
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.shared = nn.Embed(
            t5.vocab_size, t5.d_model,
            embedding_init=nn.initializers.normal(stddev=1.0),
            dtype=self.dtype, param_dtype=self.param_dtype, name="shared")
        self.encoder = Encoder(t5, name="encoder", **kw)
        self.decoder = Decoder(t5, name="decoder",
                               step_attn_impl=self.step_attn_impl, **kw)
        # [M, K, d] per-position codebooks (decoder input embeds; reference :103-105)
        self.codebooks = self.param(
            "codebooks", nn.initializers.normal(stddev=1.0),
            (self.cfg.M, self.cfg.K, t5.d_model), self.param_dtype)
        if not self.cfg.shared_output_input_embeds:
            # separate output-projection tables (reference :106-109)
            self.output_codebooks = self.param(
                "output_codebooks", nn.initializers.normal(stddev=1.0),
                (self.cfg.M, self.cfg.K, t5.d_model), self.param_dtype)
        # learned start-of-decode embedding (reference start_token_embed :112)
        self.start_embed = self.param(
            "start_embed", nn.initializers.normal(stddev=1.0),
            (t5.d_model,), self.param_dtype)

    # ---- embedding-table views ----

    def _in_books(self):
        return jnp.asarray(self.codebooks, self.dtype)

    def _out_books(self):
        books = (self.codebooks if self.cfg.shared_output_input_embeds
                 else self.output_codebooks)
        return jnp.asarray(books, self.dtype)

    # ---- encoder ----

    def encode(self, input_ids, attention_mask, deterministic: bool = True):
        """Token ids -> encoder hidden states [B, S, d]."""
        embeds = self.shared(input_ids)
        return self.encoder(embeds, attention_mask, deterministic=deterministic)

    # ---- decoder-side embedding/scoring primitives ----

    def decoder_inputs_from_codes(self, codes: jnp.ndarray) -> jnp.ndarray:
        """Shift-right decoder input embeddings for target codes [B, m].

        Position 0 gets the start embedding; position i>0 gets
        ``codebooks[i-1, codes[:, i-1]]`` (reference :194-214: token c_i is
        embedded with table i-1, the table that scores it).
        Returns [B, m, d].
        """
        b, m = codes.shape
        books = self._in_books()  # [M, K, d]
        if m > 1:
            pos = jnp.arange(m - 1)[None, :]          # table i-1 embeds token c_i
            prev = books[pos, codes[:, :m - 1]]       # [B, m-1, d]
        else:
            prev = jnp.zeros((b, 0, books.shape[-1]), self.dtype)
        start = jnp.broadcast_to(
            jnp.asarray(self.start_embed, self.dtype)[None, None, :],
            (b, 1, books.shape[-1]))
        return jnp.concatenate([start, prev], axis=1)

    def decoder_inputs_from_multi_codes(self, codes: jnp.ndarray) -> jnp.ndarray:
        """Multi-id variant: codes [B, m, G] -> mean of the G candidate
        embeddings per position (reference get_decoder_mul_inputs_embeds
        :216-248, used when a step carries several candidate smtids).
        Returns [B, m, d] shift-right inputs."""
        b, m, g = codes.shape
        books = self._in_books()
        if m > 1:
            pos = jnp.arange(m - 1)[None, :, None]
            prev = books[pos, codes[:, :m - 1, :]].mean(axis=2)  # [B, m-1, d]
        else:
            prev = jnp.zeros((b, 0, books.shape[-1]), self.dtype)
        start = jnp.broadcast_to(
            jnp.asarray(self.start_embed, self.dtype)[None, None, :],
            (b, 1, books.shape[-1]))
        return jnp.concatenate([start, prev], axis=1)

    def doc_embeds(self, codes: jnp.ndarray) -> jnp.ndarray:
        """Per-position codebook embeddings of a document's codes [B, m] ->
        [B, m, d] (reference T5SeqAQEncoder.decode :811-830)."""
        m = codes.shape[1]
        books = self._out_books()
        return books[jnp.arange(m)[None, :], codes]  # [B, m, d]

    def lm_logits(self, hidden: jnp.ndarray) -> jnp.ndarray:
        """Per-position logits: hidden [B, m, d] -> [B, m, K]
        (reference get_lm_logits :250-262, one einsum instead of a loop)."""
        m = hidden.shape[1]
        return jnp.einsum("bmd,mkd->bmk", hidden, self._out_books()[:m],
                          preferred_element_type=jnp.float32)

    # ---- full forwards ----

    def __call__(self, input_ids, attention_mask, codes,
                 deterministic: bool = True):
        """Seq2seq forward: returns decoder hidden states [B, m, d]
        (= reference forward's decoder_last_hidden_state, :295-450)."""
        enc = self.encode(input_ids, attention_mask, deterministic=deterministic)
        return self.decode_train(enc, attention_mask, codes,
                                 deterministic=deterministic)

    def _maybe_scale(self, hidden):
        """Optional hidden-state scaling before the lm head (reference
        ``scaleup_output_hidden``: sequence_output * d_model**-0.5,
        t5_generative_retriever.py:427-428 — applied to every consumer of
        the decoder output, matching the reference's placement)."""
        if self.cfg.scaleup_output_hidden:
            return hidden * (self.cfg.t5.d_model ** -0.5)
        return hidden

    def decode_train(self, enc, enc_mask, codes, deterministic: bool = True):
        dec_in = self.decoder_inputs_from_codes(codes)
        return self._maybe_scale(
            self.decoder(dec_in, enc, enc_mask, deterministic=deterministic))

    def forward_logits(self, input_ids, attention_mask, codes,
                       deterministic: bool = True):
        """Seq2seq training logits [B, m, K] for CE over labels=codes
        (reference T5SeqAQEncoderForSeq2Seq :999-1019)."""
        hidden = self(input_ids, attention_mask, codes, deterministic=deterministic)
        return self.lm_logits(hidden)

    def rerank_score(self, input_ids, attention_mask, codes,
                     deterministic: bool = True):
        """Sequential dot-product relevance score sum_i <q_i, E[i][c_i]>
        (reference rerank_forward :794-798). Returns [B]."""
        hidden = self(input_ids, attention_mask, codes, deterministic=deterministic)
        return jnp.sum(hidden.astype(jnp.float32)
                       * self.doc_embeds(codes).astype(jnp.float32), axis=(-2, -1))

    def rerank_score_prefix(self, input_ids, attention_mask, codes, lengths,
                            deterministic: bool = True):
        """rerank_score over only the first ``lengths[b]`` positions — the
        quantity the reference's query_to_smtid_reranking sums when smtids
        are prefixes (tasks/reranker.py:102-107 with seq_len = prefix len).
        codes: [B, m] padded; lengths: [B] int32. Returns [B]."""
        hidden = self(input_ids, attention_mask, codes, deterministic=deterministic)
        per_pos = jnp.sum(hidden.astype(jnp.float32)
                          * self.doc_embeds(codes).astype(jnp.float32), axis=-1)
        mask = (jnp.arange(codes.shape[1])[None, :]
                < lengths[:, None]).astype(jnp.float32)
        return jnp.sum(per_pos * mask, axis=-1)

    def dense_rep(self, input_ids, attention_mask, prefix_codes=None,
                  deterministic: bool = True):
        """Dense-encoder mode (phase 1): decoder hidden at the last input
        position, conditioned on an optional smtid prefix
        (reference T5DocIDGenEncoder.encode :534-543). Returns [B, d]."""
        if prefix_codes is None:
            prefix_codes = jnp.zeros((input_ids.shape[0], 1), jnp.int32)
            hidden = self(input_ids, attention_mask, prefix_codes,
                          deterministic=deterministic)
            return hidden[:, 0, :]
        hidden = self(input_ids, attention_mask, prefix_codes,
                      deterministic=deterministic)
        return hidden[:, -1, :]

    def dense_rep_all(self, input_ids, attention_mask, codes,
                      deterministic: bool = True):
        """All decoder positions' hidden states (query side of prefix-aware
        losses). Returns [B, m, d]."""
        return self(input_ids, attention_mask, codes, deterministic=deterministic)

    # ---- decode-path pieces (used by decode/beam.py) ----

    def decode_prepare(self, enc, batch: int, num_beams: int):
        """Precompute everything static for the scan: cross KV, biases, cache."""
        cross_kv = self.decoder.precompute_cross_kv(enc)
        self_bias = self.decoder.full_self_bias(self.cfg.M)
        cache = self.decoder.init_cache(batch, num_beams, self.cfg.M)
        return cross_kv, self_bias, cache

    def decode_step(self, tokens, cache: Cache, cross_kv: CrossKV, enc_bias,
                    self_bias, t):
        """One constrained-beam decode step.

        tokens: [B, N] int32 codes chosen at step t-1 (ignored at t=0).
        Returns (logits [B, N, K] fp32 for position t, cache, kv_new) —
        see Decoder.decode_step for the cache/kv_new contract.
        """
        b, n = tokens.shape
        books = self._in_books()
        start = jnp.broadcast_to(
            jnp.asarray(self.start_embed, self.dtype)[None, None, :],
            (b, n, books.shape[-1]))
        # at t>0 the input embedding is codebooks[t-1, token]
        prev_books = books[jnp.maximum(t - 1, 0)]        # [K, d]
        tok_embed = prev_books[tokens]                   # [B, N, d]
        x = jnp.where(t == 0, start, tok_embed)
        hidden, new_cache, kv_new = self.decoder.decode_step(
            x, cache, cross_kv, enc_bias, self_bias, t)
        hidden = self._maybe_scale(hidden)
        logits = jnp.einsum("bnd,kd->bnk", hidden, self._out_books()[t],
                            preferred_element_type=jnp.float32)
        if self.cfg.apply_log_softmax:
            logits = jax.nn.log_softmax(logits, axis=-1)
        return logits, new_cache, kv_new

    def decode_step_deferred(self, tokens, cache_src, cache_dst, src, kvg,
                             cross_kv: CrossKV, enc_bias, self_bias, t,
                             write_back: bool = True,
                             ar_chunk: Optional[int] = None, ffn_q=None):
        """decode_step with the beam reorder deferred one step and fused
        into the attention kernel (Decoder.decode_step_deferred /
        ops/attend_reorder.py). ``tokens`` are the codes chosen at step t-1
        for CURRENT beams; ``src``/``kvg`` carry the pending reorder."""
        b, n = tokens.shape
        books = self._in_books()
        start = jnp.broadcast_to(
            jnp.asarray(self.start_embed, self.dtype)[None, None, :],
            (b, n, books.shape[-1]))
        prev_books = books[jnp.maximum(t - 1, 0)]        # [K, d]
        tok_embed = prev_books[tokens]                   # [B, N, d]
        x = jnp.where(t == 0, start, tok_embed)
        hidden, new_cache, kv_new = self.decoder.decode_step_deferred(
            x, cache_src, cache_dst, src, kvg, cross_kv, enc_bias,
            self_bias, t, write_back=write_back, ar_chunk=ar_chunk,
            ffn_q=ffn_q)
        hidden = self._maybe_scale(hidden)
        logits = jnp.einsum("bnd,kd->bnk", hidden, self._out_books()[t],
                            preferred_element_type=jnp.float32)
        if self.cfg.apply_log_softmax:
            logits = jax.nn.log_softmax(logits, axis=-1)
        return logits, new_cache, kv_new

    def decode_step_megarow(self, tokens, cache_src, cache_dst, src, kvg,
                            cross_kv: CrossKV, enc_bias, self_bias, t,
                            ar_chunk: Optional[int] = None, ffn_q=None,
                            emit_quant: Optional[str] = None):
        """decode_step_deferred over the beam-major megarow cache
        (Decoder.decode_step_megarow / ops/megarow.py): one all-layers
        reorder kernel per step + sequential-read attention per layer.
        Same pending-reorder (src/kvg) dataflow and logits semantics."""
        b, n = tokens.shape
        books = self._in_books()
        start = jnp.broadcast_to(
            jnp.asarray(self.start_embed, self.dtype)[None, None, :],
            (b, n, books.shape[-1]))
        prev_books = books[jnp.maximum(t - 1, 0)]        # [K, d]
        tok_embed = prev_books[tokens]                   # [B, N, d]
        x = jnp.where(t == 0, start, tok_embed)
        hidden, new_cache, kv_new = self.decoder.decode_step_megarow(
            x, cache_src, cache_dst, src, kvg, cross_kv, enc_bias,
            self_bias, t, ar_chunk=ar_chunk, ffn_q=ffn_q,
            emit_quant=emit_quant)
        hidden = self._maybe_scale(hidden)
        logits = jnp.einsum("bnd,kd->bnk", hidden, self._out_books()[t],
                            preferred_element_type=jnp.float32)
        if self.cfg.apply_log_softmax:
            logits = jax.nn.log_softmax(logits, axis=-1)
        return logits, new_cache, kv_new


def init_ripor_params(rng: jax.Array, cfg: RiporConfig, dtype=jnp.float32):
    """Initialize a parameter pytree with dummy shapes."""
    model = RiporModel(cfg, dtype=dtype)
    ids = jnp.zeros((1, 8), jnp.int32)
    mask = jnp.ones((1, 8), jnp.int32)
    codes = jnp.zeros((1, cfg.M), jnp.int32)
    return model.init({"params": rng}, ids, mask, codes)["params"]


def install_codebooks(params, code_embeddings: np.ndarray,
                      shared_output_input_embeds: bool = True):
    """Install RQ centroids [M, K, d] as the decoder embedding tables —
    replaces the reference's checkpoint-surgery script
    (aq_preprocess/change_customized_embed_layer.py:44-88 and
    assign_output_embeds :832-849). Returns updated params pytree."""
    code_embeddings = jnp.asarray(code_embeddings)
    assert params["codebooks"].shape == code_embeddings.shape, (
        params["codebooks"].shape, code_embeddings.shape)
    new = dict(params)
    new["codebooks"] = code_embeddings.astype(params["codebooks"].dtype)
    if not shared_output_input_embeds and "output_codebooks" in params:
        new["output_codebooks"] = code_embeddings.astype(
            params["output_codebooks"].dtype)
    return type(params)(new) if not isinstance(params, dict) else new


def install_start_embed(params, start_embed: np.ndarray):
    """Install a pretrained start-of-decode embedding (reference loads
    t5_decoder_start_token_embeds/*.npy at :112-135)."""
    vec = jnp.asarray(start_embed).reshape(-1)
    assert params["start_embed"].shape == vec.shape
    new = dict(params)
    new["start_embed"] = vec.astype(params["start_embed"].dtype)
    return new
