"""Training losses — functional mirrors of the reference's per-model loss
heads, each returning a dict of named losses (the contract the trainer sums
with per-task weights; reference arguments.py:109-141 sets all weights 1.0,
tasks/trainer.py:232-243 does the weighted sum).

Loss map (reference -> here):
  T5SeqPretrainEncoder.forward      (t5_generative_retriever.py:708-769) -> pretrain_margin_mse
  T5SeqAQEncoderForMarginMSE        (:863-884)                            -> margin_mse
  T5SeqAQEncoderForSeq2Seq          (:999-1019)                           -> seq2seq_ce
  T5SeqAQEncoderForLngKnpMarginMSE  (:908-966)                            -> lng_knp_margin_mse
All batches are dicts of fixed-shape arrays (XLA-friendly).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ripor_tpu.models.dense_encoder import t5_dense_kldiv, t5_dense_margin_mse
from ripor_tpu.models.ripor import RiporModel


def _seq_dot(q_hidden: jnp.ndarray, d_embeds: jnp.ndarray) -> jnp.ndarray:
    """Sequential dot-product score sum_i <q_i, d_i> -> [B] fp32."""
    return jnp.sum(q_hidden.astype(jnp.float32) * d_embeds.astype(jnp.float32),
                   axis=(-2, -1))


def margin_mse(model: RiporModel, params, batch: Dict, train: bool = True,
               rng=None) -> Dict[str, jnp.ndarray]:
    """MarginMSE on sequential dot scores vs teacher margin
    (reference :863-884). Batch:
      query_ids/query_mask [B, L]; pos_codes/neg_codes [B, m];
      teacher_pos_score/teacher_neg_score [B].
    The reference runs the query twice (decoder prefix = pos vs neg smtid);
    we batch the two decoder passes on a shared encoder pass.
    """
    rngs = {"dropout": rng} if (train and rng is not None) else {}
    det = not train

    def fwd(codes):
        return model.apply({"params": params}, batch["query_ids"],
                           batch["query_mask"], codes,
                           deterministic=det, rngs=rngs)

    pos_hidden = fwd(batch["pos_codes"])
    neg_hidden = fwd(batch["neg_codes"])
    pos_doc = model.apply({"params": params}, batch["pos_codes"],
                          method=RiporModel.doc_embeds)
    neg_doc = model.apply({"params": params}, batch["neg_codes"],
                          method=RiporModel.doc_embeds)
    student = _seq_dot(pos_hidden, pos_doc) - _seq_dot(neg_hidden, neg_doc)
    teacher = (batch["teacher_pos_score"] - batch["teacher_neg_score"]).astype(jnp.float32)
    return {"rank": jnp.mean((student - teacher) ** 2)}


def seq2seq_ce(model: RiporModel, params, batch: Dict, train: bool = True,
               rng=None) -> Dict[str, jnp.ndarray]:
    """Per-position cross-entropy over the K-way codebook logits
    (reference :999-1019: flat CE over [B*m, K] with labels=codes).
    Batch: query_ids/query_mask [B, L]; codes [B, m]."""
    rngs = {"dropout": rng} if (train and rng is not None) else {}
    logits = model.apply({"params": params}, batch["query_ids"],
                         batch["query_mask"], batch["codes"],
                         deterministic=not train, rngs=rngs,
                         method=RiporModel.forward_logits)  # [B, m, K] f32
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, batch["codes"][:, :, None], axis=2)[:, :, 0]
    return {"rank": jnp.mean(nll)}


def lng_knp_margin_mse(model: RiporModel, params, batch: Dict,
                       train: bool = True, rng=None) -> Dict[str, jnp.ndarray]:
    """Prefix-oriented multi-objective MarginMSE (the paper's key loss;
    reference :908-966): full-length margin plus margins over prefixes
    4/8/(16) against prefix-specific teacher scores.

    Batch: as margin_mse plus smtid_{4,8,16}_teacher_{pos,neg}_score
    (which keys are present depends on m: m=8 -> 4; m=16 -> 4,8;
    m=32 -> 4,8,16 — reference :942-962)."""
    rngs = {"dropout": rng} if (train and rng is not None) else {}
    det = not train

    def fwd(codes):
        return model.apply({"params": params}, batch["query_ids"],
                           batch["query_mask"], codes,
                           deterministic=det, rngs=rngs)

    pos_hidden = fwd(batch["pos_codes"])
    neg_hidden = fwd(batch["neg_codes"])
    pos_doc = model.apply({"params": params}, batch["pos_codes"],
                          method=RiporModel.doc_embeds)
    neg_doc = model.apply({"params": params}, batch["neg_codes"],
                          method=RiporModel.doc_embeds)

    # per-position partial products let every prefix loss reuse one forward
    pos_dots = jnp.sum(pos_hidden.astype(jnp.float32) * pos_doc.astype(jnp.float32), -1)
    neg_dots = jnp.sum(neg_hidden.astype(jnp.float32) * neg_doc.astype(jnp.float32), -1)

    m = batch["pos_codes"].shape[1]
    losses = {}
    student = jnp.sum(pos_dots, -1) - jnp.sum(neg_dots, -1)
    teacher = (batch["teacher_pos_score"] - batch["teacher_neg_score"]).astype(jnp.float32)
    losses["rank"] = jnp.mean((student - teacher) ** 2)
    for plen in (4, 8, 16):
        if plen >= m:
            continue
        key = f"smtid_{plen}_teacher_pos_score"
        if key not in batch:
            continue
        s = jnp.sum(pos_dots[:, :plen], -1) - jnp.sum(neg_dots[:, :plen], -1)
        t = (batch[key] - batch[f"smtid_{plen}_teacher_neg_score"]).astype(jnp.float32)
        losses[f"rank_{plen}"] = jnp.mean((s - t) ** 2)
    return losses


def lng_knp_margin_mse_and_seq2seq(model: RiporModel, params, batch: Dict,
                                   train: bool = True, rng=None
                                   ) -> Dict[str, jnp.ndarray]:
    """Joint prefix-rank + seq2seq loss. The reference DECLARES this
    config (``t5seq_aq_encoder_lng_knp_margin_mse_and_seq2seq``,
    arguments.py:97) but never shipped its model class; the natural
    composition is implemented here: lng_knp MarginMSE on the rank keys
    plus codebook CE on an independently drawn seq2seq sub-batch (keys
    prefixed ``s2s_``, built by ``batches_from_joint``), all summed by the
    trainer with unit weights like every other multi-loss head.

    Mechanism note: the seq2seq term is the anti-forgetting rehearsal the
    phase-3 curriculum needs at slice scale (rank training erodes the
    doc->smtid mapping of non-replayed docs — measured in
    artifacts/curriculum_proof_medium.json); the alternating-stage form
    is ``run_full_recipe(phase3_seq2seq_rehearsal=True)``."""
    out = lng_knp_margin_mse(model, params, batch, train=train, rng=rng)
    s2s = {"query_ids": batch["s2s_query_ids"],
           "query_mask": batch["s2s_query_mask"],
           "codes": batch["s2s_codes"]}
    out["seq2seq"] = seq2seq_ce(model, params, s2s, train=train,
                                rng=rng)["rank"]
    return out


def pretrain_margin_mse(model: RiporModel, params, batch: Dict,
                        train: bool = True, rng=None) -> Dict[str, jnp.ndarray]:
    """Phase-1 dense-encoder MarginMSE (reference :708-769): score =
    <query dense rep, doc dense rep> where reps are decoder hidden at the
    last input position; optional codebook-commitment CE when a smtid
    prefix is present (:617-670).

    Batch: query_ids/query_mask, pos_doc_ids/pos_doc_mask,
    neg_doc_ids/neg_doc_mask, teacher_pos_score, teacher_neg_score;
    optional pos_prefix_codes/neg_prefix_codes [B, p] (prefix-conditioned
    stage with commit loss)."""
    rngs = {"dropout": rng} if (train and rng is not None) else {}
    det = not train
    has_prefix = "pos_prefix_codes" in batch

    def reps(ids, mask, codes):
        # hidden over [start] + prefix; last position is the dense rep
        return model.apply({"params": params}, ids, mask, codes,
                           deterministic=det, rngs=rngs)

    if has_prefix:
        # decoder inputs: [start, c1..cp] -> hidden length p+1
        def with_start(prefix):
            # model API consumes target codes; here the decoder *inputs* are
            # the prefix, so append a dummy target slot
            return jnp.concatenate(
                [prefix, jnp.zeros_like(prefix[:, :1])], axis=1)
        pos_codes = with_start(batch["pos_prefix_codes"])
        neg_codes = with_start(batch["neg_prefix_codes"])
    else:
        pos_codes = jnp.zeros((batch["query_ids"].shape[0], 1), jnp.int32)
        neg_codes = pos_codes

    pq = reps(batch["query_ids"], batch["query_mask"], pos_codes)
    nq = pq if not has_prefix else reps(batch["query_ids"], batch["query_mask"], neg_codes)
    pd = reps(batch["pos_doc_ids"], batch["pos_doc_mask"], pos_codes)
    nd = reps(batch["neg_doc_ids"], batch["neg_doc_mask"], neg_codes)

    pos_s = jnp.sum(pq[:, -1].astype(jnp.float32) * pd[:, -1].astype(jnp.float32), -1)
    neg_s = jnp.sum(nq[:, -1].astype(jnp.float32) * nd[:, -1].astype(jnp.float32), -1)
    teacher = (batch["teacher_pos_score"] - batch["teacher_neg_score"]).astype(jnp.float32)
    out = {"rank": jnp.mean(((pos_s - neg_s) - teacher) ** 2)}

    if has_prefix:
        # commitment CE: prefix-position hidden states should select the
        # prefix codes from the codebooks (reference get_commit_loss :617-670,
        # applied to pos doc, neg doc, and pos query reps)
        p = batch["pos_prefix_codes"].shape[1]
        commit = 0.0
        for hidden, labels in ((pd, batch["pos_prefix_codes"]),
                               (nd, batch["neg_prefix_codes"]),
                               (pq, batch["pos_prefix_codes"])):
            logits = model.apply({"params": params}, hidden[:, :p],
                                 method=RiporModel.lm_logits)  # [B, p, K]
            logp = jax.nn.log_softmax(logits, axis=-1)
            commit = commit - jnp.mean(
                jnp.take_along_axis(logp, labels[:, :, None], axis=2))
        out["commit"] = commit
    return out


def ranknet(model: RiporModel, params, batch: Dict, train: bool = True,
            rng=None) -> Dict[str, jnp.ndarray]:
    """RankNet pairwise loss on sequential dot scores (reference
    t5seq_aq_encoder_ranknet loss_type; losses/pairwise.py:3-45)."""
    rngs = {"dropout": rng} if (train and rng is not None) else {}
    det = not train

    def fwd(codes):
        return model.apply({"params": params}, batch["query_ids"],
                           batch["query_mask"], codes,
                           deterministic=det, rngs=rngs)

    pos = _seq_dot(fwd(batch["pos_codes"]),
                   model.apply({"params": params}, batch["pos_codes"],
                               method=RiporModel.doc_embeds))
    neg = _seq_dot(fwd(batch["neg_codes"]),
                   model.apply({"params": params}, batch["neg_codes"],
                               method=RiporModel.doc_embeds))
    return {"rank": jnp.mean(jnp.log1p(jnp.exp(-(pos - neg))))}


def t5seq_bce(model, params, batch: Dict, train: bool = True,
              rng=None) -> Dict[str, jnp.ndarray]:
    """BCE classification for the T5SeqCrossEncoder teacher (reference
    loss_type=t5seq_bce; modeling/cross_encoder.py:75-92 — the reference's
    own main.py never dispatches this model_type, so this path is
    framework-complete beyond the reference). Batch: query_ids/query_mask
    [B, L]; codes [B, m]; labels [B] in {0, 1}."""
    from ripor_tpu.models.cross_encoder import bce_loss
    rngs = {"dropout": rng} if (train and rng is not None) else {}
    logits = model.apply({"params": params}, batch["query_ids"],
                         batch["query_mask"], batch["codes"],
                         deterministic=not train, rngs=rngs)
    return {"cls": bce_loss(logits, batch["labels"])}


def bert_bce(model, params, batch: Dict, train: bool = True,
             rng=None) -> Dict[str, jnp.ndarray]:
    """BCE classification for the BERT cross-encoder teacher (reference
    CrossEncoder.forward, modeling/cross_encoder.py:17-23, loss_type=
    bert_bce). Batch: input_ids/attention_mask [B, L]; optional
    token_type_ids; labels [B] in {0, 1}."""
    from ripor_tpu.models.cross_encoder import bce_loss
    rngs = {"dropout": rng} if (train and rng is not None) else {}
    logits = model.apply({"params": params}, batch["input_ids"],
                         batch["attention_mask"],
                         batch.get("token_type_ids"),
                         deterministic=not train, rngs=rngs)
    return {"cls": bce_loss(logits, batch["labels"])}


LOSS_FNS = {
    "t5seq_aq_encoder_margin_mse": margin_mse,
    "t5seq_aq_encoder_seq2seq": seq2seq_ce,
    "t5seq_aq_encoder_lng_knp_margin_mse": lng_knp_margin_mse,
    "t5seq_aq_encoder_lng_knp_margin_mse_and_seq2seq":
        lng_knp_margin_mse_and_seq2seq,
    "t5seq_pretrain_margin_mse": pretrain_margin_mse,
    "t5seq_aq_encoder_ranknet": ranknet,
    # teacher / baseline families (reference arguments.py:81-100 whitelist
    # names): the trainer is model-agnostic — pass the matching model
    "t5seq_bce": t5seq_bce,
    "bert_bce": bert_bce,
    "margin_mse": t5_dense_margin_mse,   # T5ModelEncoder baseline
    "kldiv": t5_dense_kldiv,             # T5ModelEncoderForKLDiv baseline
}
