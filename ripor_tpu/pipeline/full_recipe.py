"""The full RIPOR 3-phase training recipe, end-to-end in one driver.

Mirrors the reference's chained shell pipelines (full_scripts/
full_train_t5seq_encoder_{0,1}.sh + full_train_t5seq_seq2seq_0_1_pipeline.sh
+ full_lng_knp_train_pipline.sh:28-100 + marco_train_t5seq_cross_encoder.sh
+ all_aq_pipline; SURVEY.md §3.5) as one resumable function:

  teacher  BM25 run -> BCE examples -> BertCrossEncoder (stands in for the
           off-the-shelf MiniLM teacher this image cannot download)
  phase 1  two MarginMSE distillation stages, exactly as the reference:
           stage 0 trains on the TEACHER-RESCORED BM25 run
           (full_train_t5seq_encoder_0.sh:13), stage 1 re-trains from the
           stage-0 checkpoint on SELF-MINED candidates — the stage-0
           model's own dense retrieval, teacher-rescored
           (full_train_t5seq_encoder_1.sh:12-15)
  docids   corpus encode (stage-1 model) -> RQ -> docid_to_smtid +
           codebook install
  phase 2  seq2seq CE on query->smtid pairs (doc2query pseudo-queries,
           teacher-filtered, when no real query_to_docid file is given) +
           MarginMSE on the stage-1 model's retrieval, teacher-rescored
  phase 3  flywheel datagen seeded by the CURRENT model's dense retrieval
           (reference retrieve_train_queries, evaluate.py:229-266), teacher
           rescoring + decay merge, then the prefix curriculum: sub-smtid
           MarginMSE at 4, lng_knp at 8/16/32

Every trainset on the default path carries REAL teacher scores over
RETRIEVED candidates — there is no synthetic-score branch. Every stage
checkpoints into the workspace and is skipped when its outputs exist
(Workspace/stage_train semantics), so an interrupted run resumes.
"""
from __future__ import annotations

import itertools
import json
from typing import Dict, List, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ripor_tpu.data import (
    BceExamples,
    BertBceCollator,
    Collection,
    MarginMSECollator,
    PretrainCollator,
    Seq2SeqCollator,
    Seq2SeqExamples,
    TeacherScoreExamples,
    batches_from_bce,
    batches_from_seq2seq,
    batches_from_teacher_examples,
    build_bce_examples,
    load_docid_to_smtid,
    load_qrel,
    save_bce_examples,
)
from ripor_tpu.models import RiporConfig, RiporModel
from ripor_tpu.models.cross_encoder import BertCrossEncoder
from ripor_tpu.models.ripor import init_ripor_params
from ripor_tpu.pipeline.e2e import _small_cfg
from ripor_tpu.pipeline.flywheel import datagen_round, write_jsonl
from ripor_tpu.pipeline.recipe import (
    Workspace,
    stage_build_docids,
    stage_build_trie,
    stage_encode_corpus,
    stage_evaluate,
    stage_install_codebooks,
    stage_retrieve,
    stage_tokenizer,
    stage_train,
)
from ripor_tpu.train import TrainConfig


class _QueryOverlay:
    """``queries[qid]`` view that resolves pseudo-query ids from a dict and
    everything else from the base Collection (phase3_pseudo_rank)."""

    def __init__(self, base, extra: Dict[str, str]):
        self._base, self._extra = base, extra

    def __getitem__(self, qid: str) -> str:
        t = self._extra.get(str(qid))
        return t if t is not None else self._base[qid]


def _epochs_steps(n_examples: int, batch_size: int, epochs: int) -> int:
    return max(1, epochs * max(1, n_examples // batch_size))


def _stage_bm25_run(ws: Workspace, queries: Collection, docs: Collection,
                    topk: int) -> Dict[str, Dict[str, float]]:
    """First-stage lexical run (the reference's prebuilt Anserini artifact,
    data/msmarco-full/bm25_run — full_train_t5seq_encoder_0.sh:13)."""
    path = ws.path("bm25_run.json")
    if path.exists():
        return json.loads(path.read_text())
    from ripor_tpu.evaluation.bm25 import BM25Index
    ws.log(f"BM25 run over {len(docs)} docs / {len(queries)} queries")
    index = BM25Index(docs.texts)
    run = index.run(queries.ids, queries.texts, docs.ids, topk=topk)
    path.write_text(json.dumps(run))
    return run


def _train_bert_teacher(ws: Workspace, tok, queries: Collection,
                        docs: Collection, qrel,
                        run: Mapping[str, Mapping[str, float]],
                        epochs: int, batch_size: int, seed: int,
                        geometry: Optional[Dict] = None,
                        learning_rate: float = 1e-3,
                        neg_sample: int = 8,
                        warmup: float = 0.0,
                        stage: str = "bert_teacher") -> str:
    """Train the BertCrossEncoder teacher on bce_examples built from the
    qrel + the run's candidates (reference
    build_bce_example_for_t5seq_encoder.py draws negatives from the
    query's run) and save it with its geometry. Returns the checkpoint
    dir. The reference downloads ms-marco-MiniLM-L-6-v2 instead
    (arguments.py:218); zero egress means we train our own.

    ``warmup`` (fraction of total steps) is required for deep teachers:
    d128x4+ at a flat lr never leaves init (BCE pinned at ln2, measured in
    artifacts/teacher_strength.json d128x4e60). ``stage`` names the
    checkpoint/trainset so the hard-negative refresh pass
    (``teacher_refresh``) can coexist with the stage-0 teacher."""
    ckpt = ws.path(f"checkpoints/{stage}")
    geo = geometry or dict(d_model=64, num_layers=2, num_heads=4, d_ff=128,
                           max_position=128)
    if (ckpt / "params").exists():
        return str(ckpt)
    bce_path = ws.path("bce_examples.train.tsv" if stage == "bert_teacher"
                       else f"bce_examples.{stage}.tsv")
    if not bce_path.exists():
        save_bce_examples(bce_path, build_bce_examples(
            qrel, run, neg_sample=neg_sample, seed=seed))
    examples = BceExamples(bce_path)
    coll = BertBceCollator(tok, queries, docs, max_length=64)
    model = BertCrossEncoder(vocab_size=tok.vocab_size, **geo)
    ids0 = jnp.ones((1, 8), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(seed)}, ids0,
                        ids0)["params"]
    bz = min(batch_size, len(examples))
    total = _epochs_steps(len(examples), bz, epochs)
    tcfg = TrainConfig(loss_type="bert_bce", learning_rate=learning_rate,
                       total_steps=total,
                       warmup_steps=int(warmup * total))
    batches = batches_from_bce(examples, coll, bz, epochs=epochs,
                               drop_last=False)
    stage_train(ws, stage, model, params, tcfg, batches, None,
                rng_seed=seed)
    (ckpt / "bert_geometry.json").write_text(json.dumps(geo))
    return str(ckpt)


def _teacher_quality(ws: Workspace, teacher_fn, tok, queries: Collection,
                     docs: Collection, bce_path,
                     batch_size: int = 64,
                     stage: str = "bert_teacher") -> Dict[str, float]:
    """Measure the trained teacher's pos/neg logit separation on its own
    trainset — the margin SCALE the student will distill. The reference's
    MiniLM teacher ships with multi-unit logit margins; a from-scratch
    teacher left at init produces ~0 margins, turning every MarginMSE
    phase into 'make all scores equal' (measured: it collapses phase 3).
    Cached in the workspace next to the checkpoint."""
    qpath = ws.path(f"checkpoints/{stage}/teacher_quality.json")
    if qpath.exists():
        return json.loads(qpath.read_text())
    from ripor_tpu.evaluation.reranker import rerank_pairs
    rows = BceExamples(bce_path).rows
    scored = rerank_pairs(teacher_fn, tok, queries, docs,
                          [(q, d) for q, d, _ in rows],
                          batch_size=batch_size, max_length=64)
    pos = [scored[q][d] for q, d, lab in rows if lab == 1]
    neg = [scored[q][d] for q, d, lab in rows if lab != 1]
    q = {"pos_logit_mean": float(np.mean(pos)),
         "neg_logit_mean": float(np.mean(neg)),
         "margin": float(np.mean(pos) - np.mean(neg)),
         "n_pos": len(pos), "n_neg": len(neg)}
    qpath.write_text(json.dumps(q))
    return q


def _teacher_trainset(ws: Workspace, name: str,
                      run: Mapping[str, Mapping[str, float]],
                      teacher_pair_scores,
                      qid_to_reldocid_to_score: Mapping[str, Mapping[str, float]],
                      top_k: int) -> str:
    """Candidate run -> teacher-rescored, qrel-anchored MarginMSE trainset
    (the reference chain rerank_for_create_trainset{,_2} (rerank.py:41-105)
    + add_qrel_to_rerank_run.py). Returns the JSONL path."""
    from ripor_tpu.pipeline.datagen import (qrel_added_teacher_examples,
                                            teacher_run_to_examples)
    path = ws.path(name)
    if path.exists():
        return str(path)
    ws.log(f"teacher-rescoring run -> {name}")
    pairs = sorted({(str(q), str(d)) for q, docs in run.items() for d in docs})
    scored = teacher_pair_scores(pairs)
    rows = qrel_added_teacher_examples(
        teacher_run_to_examples(scored, top_k=top_k),
        qid_to_reldocid_to_score)
    # a row needs >= 2 candidates to sample a negative (dataset.py:589-595)
    rows = [r for r in rows if len(r["docids"]) >= 2]
    write_jsonl(str(path), rows)
    return str(path)


def _trainset_mrr(path: str, qrel: Mapping[str, Mapping[str, int]],
                  k: int = 10) -> float:
    """MRR@k of the qrel positive within each teacher-rescored trainset
    row, ranking by the teacher's scores — the TEACHER's own candidate-
    ranking quality, i.e. the quality of the distillation target itself.
    Every MarginMSE phase pulls the student toward this ranking, so it
    must EXCEED the student's (the reference's premise: its MiniLM teacher
    outranks the phase-2 student on MS MARCO; measured r4: a weaker-than-
    student teacher collapses phase 3, tools/mnt4_dynamics.py)."""
    from ripor_tpu.pipeline.flywheel import read_jsonl
    rr = []
    for ex in read_jsonl(path):
        rel = {d for d, r in qrel.get(str(ex["qid"]), {}).items() if r > 0}
        if not rel:
            continue
        order = np.argsort(-np.asarray(ex["scores"]))
        ranked = [ex["docids"][i] for i in order[:k]]
        r = next((i + 1 for i, d in enumerate(ranked) if d in rel), None)
        rr.append(1.0 / r if r else 0.0)
    return float(np.mean(rr)) if rr else 0.0


def _dense_run(ws: Workspace, name: str, embs: np.ndarray,
               model: RiporModel, params, tok, queries: Collection,
               docids: Sequence[str], topk: int,
               batch_size: int) -> Dict[str, Dict[str, float]]:
    """Dense retrieval of the train queries over a doc-embedding matrix
    (reference retrieve_train_queries, evaluate.py:229-266). Cached."""
    path = ws.path(name)
    if path.exists():
        return json.loads(path.read_text())
    from ripor_tpu.data.tokenizer import tokenize_queries
    from ripor_tpu.evaluation.retriever import dense_topk

    @jax.jit
    def rep(ids, mask):
        return model.apply({"params": params}, ids, mask,
                           method=RiporModel.dense_rep)

    reps = []
    n = len(queries)
    for s in range(0, n, batch_size):
        texts = [queries.text_at(i) for i in range(s, min(s + batch_size, n))]
        pad = batch_size - len(texts)
        ids, mask = tokenize_queries(tok, texts + [""] * pad, 64)
        r = np.asarray(rep(jnp.asarray(ids), jnp.asarray(mask)), np.float32)
        reps.append(r[:len(texts)])
    q = np.concatenate(reps, axis=0)
    scores, idx = dense_topk(q, np.asarray(embs, np.float32),
                             min(topk, len(docids)))
    run = {str(qid): {str(docids[d]): float(s)
                      for d, s in zip(qi, qs)}
           for qid, qi, qs in zip(queries.ids, idx, scores)}
    path.write_text(json.dumps(run))
    return run


def _pseudo_query_trainset(ws: Workspace, docs: Collection, queries,
                           qrel, teacher_pair_scores, per_doc: int,
                           seed: int) -> str:
    """query->docid seq2seq source when no real doc2query artifact exists:
    sample word spans from each doc as pseudo-queries, teacher-score every
    (pseudo-query, doc) pair, and keep pairs above the median score via
    datagen.pseudo_query_examples — the same filter shape as the
    reference's create_pseudo_query_to_docid_map.py:18-27 (its threshold
    is an absolute MiniLM logit; ours is a quantile because the trained
    toy teacher has its own scale). Real train-query->positive pairs ride
    along, as in the reference's query_to_docid.train.json."""
    from ripor_tpu.pipeline.datagen import pseudo_query_examples
    path = ws.path("query_to_docid.train.jsonl")
    if path.exists():
        return str(path)
    ws.log("building pseudo-query seq2seq trainset")
    rng = np.random.default_rng(seed)
    pq_texts: Dict[str, str] = {}
    pairs: List[Tuple[str, str]] = []
    for did, text in zip(docs.ids, docs.texts):
        words = text.split()
        for j in range(per_doc):
            if len(words) <= 2:
                span = words
            else:
                ln = int(rng.integers(2, min(7, len(words) + 1)))
                s = int(rng.integers(0, len(words) - ln + 1))
                span = words[s:s + ln]
            pqid = f"pq_{did}_{j}"
            pq_texts[pqid] = " ".join(span)
            pairs.append((pqid, str(did)))
    scored = teacher_pair_scores(pairs, query_texts=pq_texts)
    d2r = {}
    for pqid, did in pairs:
        d2r.setdefault(did, {})[pqid] = scored[pqid][did]
    all_scores = [s for rd in d2r.values() for s in rd.values()]
    thresh = float(np.median(all_scores))
    _, filtered = pseudo_query_examples(d2r, pq_texts,
                                        score_threshold=thresh)
    rows = list(filtered)
    for qid, rels in qrel.items():
        for d, r in rels.items():
            if r > 0:
                rows.append({"docid": str(d), "query": queries[qid]})
    write_jsonl(str(path), rows)
    return str(path)


def run_full_recipe(workspace: str, docs_dir: str, queries_dir: str,
                    qrel_path: str,
                    M: int = 8, K: int = 32, vocab_size: int = 600,
                    cfg: Optional[RiporConfig] = None,
                    phase1_epochs: int = 10, teacher_epochs: int = 20,
                    s2s_epochs: int = 40, mm_epochs: int = 10,
                    phase3_epochs: int = 10,
                    curriculum: Optional[Sequence[int]] = None,
                    num_beams: int = 10, topk: int = 100,
                    batch_size: int = 16, decay: int = 2,
                    teacher_geometry: Optional[Dict] = None,
                    seed: int = 0,
                    tokenizer_kind: str = "unigram",
                    bm25_topk: int = 50, retrieve_topk: int = 50,
                    trainset_topk: int = 200,
                    query_to_docid_path: Optional[str] = None,
                    pseudo_queries_per_doc: int = 2,
                    dr_topk: int = 100,
                    phase3_sym_neg: bool = False,
                    prefix_eval: Sequence[int] = (),
                    datagen_num_beams: Optional[int] = None,
                    teacher_lr: float = 1e-3,
                    min_teacher_margin: float = 0.0,
                    mm_lr: float = 1e-4, phase3_lr: float = 1e-4,
                    phase3_prefix_heads: bool = True,
                    calibrate_teacher_scale: bool = False,
                    teacher_neg_sample: int = 8,
                    min_teacher_mrr: float = 0.0,
                    teacher_warmup: float = 0.0,
                    teacher_refresh: bool = False,
                    phase3_seq2seq_rehearsal: bool = False,
                    phase3_rehearsal_lr: float = 1e-3,
                    phase3_rehearsal_epochs: int = 1,
                    phase3_joint_seq2seq: bool = False,
                    phase3_joint_weight: float = 1.0,
                    phase3_rehearsal_max_steps: int = 0,
                    phase3_pseudo_rank: int = 0,
                    phase3_l2sp: float = 0.0
                    ) -> Dict[str, Dict[str, float]]:
    """Run phases 1..3 on a corpus slice; returns per-phase retrieval
    metrics {"phase2": {...}, "phase3": {...}} so callers can assert the
    curriculum improves retrieval (reference's end state after
    full_lng_knp_train_pipline.sh).

    ``tokenizer_kind="word"`` makes the whole run deterministic (the Rust
    Unigram trainer is unseeded). ``prefix_eval=(4, 8)`` additionally
    evaluates PREFIX-truncated retrieval per phase (sub-smtid decode, the
    paper's early-step-ranking claim) into metrics["phaseN_prefixP"].
    ``phase3_sym_neg`` routes phase-3 examples through the symmetric-
    hard-negative builder (datagen.merge_self_neg_sym_neg) instead of the
    published decay-merge; ``query_to_docid_path`` supplies a real doc2query
    JSONL ({"docid","query"}) and skips pseudo-query generation.

    ``min_teacher_margin`` > 0 gates on the trained teacher's pos-neg logit
    separation: every MarginMSE phase distills the teacher's MARGINS, so a
    teacher whose logits never left init (margin ~0) silently teaches the
    student to collapse all scores (the reference never hits this — its
    MiniLM teacher ships pretrained with multi-unit margins). The measured
    quality is logged either way.

    ``calibrate_teacher_scale`` rescales the teacher's scores to the
    STUDENT's measured margin scale (one least-squares scalar per score
    column, train/calibrate.py) before every MarginMSE stage that refines
    an already-trained scorer (phase-2 MM and each phase-3 stage — NOT
    phase 1, whose student starts at init where the probe is degenerate).
    At the reference's scale the mismatch is absorbed by 250k phase-2 MM
    steps (full_train_t5seq_seq2seq_0_1_pipeline.sh:55-72); at slice scale
    the uncalibrated MSE's rescaling transient destroys what seq2seq built
    (measured r3/r4: dev MRR 0.267 -> 0.130 through phase-2 MM alone).

    ``min_teacher_mrr`` > 0 gates on the teacher's CANDIDATE-RANKING
    quality (MRR@10 of the qrel positive in the teacher-rescored BM25
    trainset, _trainset_mrr) — the distillation-target quality itself.
    The r4 collapse microscope (tools/mnt4_dynamics.py) showed margin
    alone is insufficient: a teacher with a healthy 10-unit margin but
    candidate MRR 0.76 < the student's 0.99 train fit pulls every
    MarginMSE phase DOWNWARD. ``teacher_neg_sample`` controls how many
    BM25 hard negatives each qrel positive is contrasted with in the
    teacher's BCE trainset (reference
    build_bce_example_for_t5seq_encoder.py:57-68).

    ``teacher_refresh`` retrains the teacher from scratch once the
    phase-1 stage-0 model's SELF-MINED dense run exists, drawing BCE
    negatives from the union of the BM25 run and that run — the
    candidates every later MarginMSE stage actually asks the teacher to
    rank. A BM25-only teacher has never seen those hard negatives and
    under-ranks them (measured knee in artifacts/teacher_strength.json:
    train-candidate MRR 0.747 bm25-only vs 0.820-0.831 with the union
    pool; the 0.747 teacher is the r3 phase-3 collapse). The refreshed
    teacher replaces the stage-0 one for everything downstream —
    qid_to_reldocid_to_score is recomputed and the ``min_teacher_mrr``
    gate moves to the refreshed teacher's stage-1 trainset. The reference
    never needs this because its teacher is pretrained ms-marco-MiniLM
    (arguments.py:218) — already strong on self-mined negatives.
    ``teacher_warmup`` is the lr-warmup fraction for both teacher
    trainings (deep teachers never leave init without it).

    ``phase3_seq2seq_rehearsal`` interleaves a one-epoch seq2seq pass
    after every phase-3 rank stage — the alternating form of the
    reference's declared-but-unshipped joint config
    ``t5seq_aq_encoder_lng_knp_margin_mse_and_seq2seq``
    (arguments.py:97). At slice scale this is the difference between the
    curriculum regressing and improving held-out retrieval: rank training
    erodes the memorized doc->smtid mapping of docs outside the train
    queries (measured medium-proof bleed 0.291 -> 0.265 dev MRR@10), and
    rehearsal both recovers it and preserves the curriculum's prefix-
    ranking gains (0.303 curriculum+rehearsal vs 0.294 rehearsal-only vs
    0.291 phase 2; tools/phase3_sweep.py rhs_only/cur_rhs).

    ``phase3_rehearsal_lr``/``phase3_rehearsal_epochs`` size the rehearsal
    dose. The right dose SCALES INVERSELY with corpus size: the rehearsal
    trainset (pseudo-queries for all docs + train queries) grows with the
    corpus while its loss is already fit after phase 2 (first logged
    rehearsal step 0.089 at 2400 docs), so at lr 1e-3 a large corpus gets
    hundreds of near-zero-loss steps of pure codebook perturbation that
    WIPE the rank stage's gains (measured full-scale r4: rank stage +0.005
    dev MRR, following rehearsal -0.032; artifacts/phase3_dynamics_r4.md).

    ``phase3_joint_seq2seq`` trains each phase-3 stage with the reference's
    declared joint config ``t5seq_aq_encoder_lng_knp_margin_mse_and_
    seq2seq`` (arguments.py:97): every rank batch carries a seq2seq
    sub-batch (batches_from_joint) so the anti-forgetting gradient arrives
    continuously AT THE RANK LR instead of as a separate high-lr pass —
    the dose then scales with rank steps, not corpus size. Use INSTEAD of
    ``phase3_seq2seq_rehearsal`` (both at once double-doses).

    ``phase3_joint_weight`` weights the joint loss's seq2seq term
    (TrainConfig.loss_weights — the reference's ln_to_weight machinery,
    arguments.py:109-141). At unit weight the seq2seq CE (~2-5) is ~0.3%
    of the calibrated rank MSE (~1000-2000) and contributes nothing to
    the clipped gradient direction — the r4 measurement of joint-at-1.0
    being indistinguishable from rehearsal-off is exactly this
    (artifacts/phase3_fullscale_sweep_full.json: 0.2719 vs no_rhs).
    Set to ~the measured grad-norm ratio for gradient parity
    (tools/phase3_probe.py measures it on a workspace).

    ``phase3_rehearsal_max_steps`` > 0 caps each rehearsal pass's step
    count (batch iterator truncation + matching lr schedule): the
    anti-forgetting dose in optimizer steps stays FIXED as the corpus
    grows instead of scaling with the rehearsal trainset (at 2400 docs a
    full epoch is ~255 steps at 10x the rank lr — measured to wipe the
    rank stage's gains; the medium rung's proven dose is ~60 steps).

    ``phase3_pseudo_rank`` > 0 adds up to that many pseudo-queries PER DOC
    (from the phase-2 seq2seq trainset, already teacher-filtered) as extra
    rank-training queries whose positive is their own doc. Mechanism
    (measured, /root/repo/.workdir diag r5): docs that appear in rank
    training only as negatives lose beam survival (held-out recall@10
    0.475 -> 0.421 over the curriculum) while ranking CONDITIONAL on
    survival improves — pseudo-query positives give every doc an upward
    rank-loss gradient at the rank lr, inside the same loss, no separate
    rehearsal pass. Reference analogue: the pseudo-query flywheel
    (aq_preprocess/create_pseudo_query_to_docid_map.py) feeding the rank
    stage's query pool instead of only the seq2seq stage.
    MEASURED DEAD END at full proof scale (dev MRR 0.077 vs phase2 0.273,
    artifacts/phase3_fullscale_sweep_full_r5.json pq1): cluster-generic
    pseudo-queries are ambiguous to the teacher — in 78% of generated rows
    the top-scored candidate is a same-cluster NEIGHBOUR, so MarginMSE
    pushes each doc below its cluster-mates at 3x the rank dose. Kept as a
    knob for corpora with doc-specific pseudo-queries.

    ``phase3_l2sp`` > 0 enables the decoupled L2-SP spring toward the
    phase-2 entry params during the rank (mnt) stages (trainer.py
    l2sp_rate — the per-step pull fraction). The mechanism-matched
    anti-forgetting lever after pq failed: it damps exactly the unopposed
    doc->smtid drift of never-positive docs without a separate rehearsal
    pass or extra data."""
    ws = Workspace(workspace)
    docs = Collection(docs_dir)
    queries = Collection(queries_dir)
    qrel = load_qrel(qrel_path)

    tok = stage_tokenizer(ws, docs.texts + queries.texts, vocab_size,
                          kind=tokenizer_kind)
    cfg = cfg or _small_cfg(M, K, tok.vocab_size)
    # curriculum from the RESOLVED config's M — a custom cfg with M=32 must
    # get the full 4->8->16->32 ladder even if the M parameter was left at
    # its default (reference full_lng_knp_train_pipline.sh:28-100)
    curriculum = list(curriculum) if curriculum is not None else sorted(
        {p for p in (4, 8, 16, 32) if p < cfg.M} | {cfg.M})
    model = RiporModel(cfg)
    params = init_ripor_params(jax.random.PRNGKey(seed), cfg)

    # ---- BM25 + cross-encoder teacher -----------------------------------
    bm25 = _stage_bm25_run(ws, queries, docs, topk=bm25_topk)
    teacher_ckpt = _train_bert_teacher(ws, tok, queries, docs, qrel, bm25,
                                       epochs=teacher_epochs,
                                       batch_size=batch_size, seed=seed,
                                       geometry=teacher_geometry,
                                       learning_rate=teacher_lr,
                                       neg_sample=teacher_neg_sample,
                                       warmup=teacher_warmup)
    from ripor_tpu.evaluation.reranker import load_bert_teacher, rerank_pairs
    teacher_fn = load_bert_teacher(teacher_ckpt, tok.vocab_size)
    tq = _teacher_quality(ws, teacher_fn, tok, queries, docs,
                          ws.path("bce_examples.train.tsv"))
    ws.log(f"teacher quality: margin={tq['margin']:.3f} "
           f"(pos {tq['pos_logit_mean']:.3f} / neg {tq['neg_logit_mean']:.3f})")
    if tq["margin"] < min_teacher_margin:
        raise ValueError(
            f"teacher pos-neg logit margin {tq['margin']:.3f} < required "
            f"{min_teacher_margin} — distilling from a non-separating "
            f"teacher collapses the student's margins; raise teacher_epochs"
            f"/geometry or lower teacher_lr")

    def teacher_pair_scores(pairs, query_texts=None):
        return rerank_pairs(teacher_fn, tok,
                            query_texts if query_texts is not None
                            else queries,
                            docs, list(pairs), batch_size=64, max_length=64)

    # teacher scores of the qrel (q, rel doc) pairs — the reference's
    # qid_to_reldocid_to_score.json (add_qrel_to_rerank_run.py:6)
    rel_path = ws.path("qid_to_reldocid_to_score.json")
    if not rel_path.exists():
        rel_pairs = [(str(q), str(d)) for q, rels in qrel.items()
                     for d, r in rels.items() if r > 0]
        scored = teacher_pair_scores(rel_pairs)
        rel_path.write_text(json.dumps(scored))
    qid_to_reldocid_to_score = json.loads(rel_path.read_text())

    # ---- phase 1: two-stage dense distillation ---------------------------
    # stage 0: teacher-rescored BM25 candidates
    # (full_train_t5seq_encoder_0.sh: loss t5seq_pretrain_margin_mse)
    pre_coll = PretrainCollator(tok, queries, docs, max_length=64)

    def _pretrain_stage(stage_name: str, trainset_path: str, p):
        pre_examples = TeacherScoreExamples(trainset_path)
        bz = min(batch_size, len(pre_examples))
        tcfg = TrainConfig(loss_type="t5seq_pretrain_margin_mse",
                           learning_rate=1e-3,
                           total_steps=_epochs_steps(len(pre_examples), bz,
                                                     phase1_epochs))
        return stage_train(
            ws, stage_name, model, p, tcfg,
            batches_from_teacher_examples(pre_examples, pre_coll, bz,
                                          epochs=phase1_epochs,
                                          drop_last=False),
            cfg, rng_seed=seed)

    t0 = _teacher_trainset(ws, "pretrain_trainset_0.jsonl", bm25,
                           teacher_pair_scores, qid_to_reldocid_to_score,
                           top_k=trainset_topk)
    tmrr = _trainset_mrr(t0, qrel)
    ws.log(f"teacher candidate-ranking MRR@10 (rescored BM25): {tmrr:.4f}")
    # with a refresh pass coming, the stage-0 teacher only needs to seed
    # phase-1 stage 0 — the quality gate moves to the refreshed teacher
    if not teacher_refresh and tmrr < min_teacher_mrr:
        raise ValueError(
            f"teacher candidate-ranking MRR@10 {tmrr:.4f} < required "
            f"{min_teacher_mrr} — the distillation target ranks worse than "
            f"the gate; every MarginMSE phase would pull the student toward "
            f"a weaker ranking (measured collapse, tools/mnt4_dynamics.py). "
            f"Raise teacher geometry/epochs/neg_sample")
    params = _pretrain_stage("phase1_pretrain", t0, params)

    # stage 1: SELF-MINED candidates — dense retrieval by the stage-0
    # model, teacher-rescored (full_train_t5seq_encoder_1.sh:12-15)
    embs0 = stage_encode_corpus(ws, model, params, docs, tok, max_length=64,
                                batch_size=batch_size,
                                out_name="doc_embeds_phase1_0.npy")
    run0 = _dense_run(ws, "dense_run_phase1_0.json", embs0, model, params,
                      tok, queries, docs.ids, topk=retrieve_topk,
                      batch_size=batch_size)

    if teacher_refresh:
        # hard-negative teacher refresh: retrain from scratch on
        # BM25 ∪ self-mined negatives, then swap it in for everything
        # downstream (see the run_full_recipe docstring)
        union = {q: dict(ds) for q, ds in bm25.items()}
        for q, ds in run0.items():
            union.setdefault(q, {}).update(ds)
        teacher_ckpt = _train_bert_teacher(
            ws, tok, queries, docs, qrel, union, epochs=teacher_epochs,
            batch_size=batch_size, seed=seed, geometry=teacher_geometry,
            learning_rate=teacher_lr, neg_sample=teacher_neg_sample,
            warmup=teacher_warmup, stage="bert_teacher_refresh")
        teacher_fn = load_bert_teacher(teacher_ckpt, tok.vocab_size)
        tq = _teacher_quality(ws, teacher_fn, tok, queries, docs,
                              ws.path("bce_examples.bert_teacher_refresh.tsv"),
                              stage="bert_teacher_refresh")
        ws.log(f"refreshed teacher quality: margin={tq['margin']:.3f} "
               f"(pos {tq['pos_logit_mean']:.3f} / "
               f"neg {tq['neg_logit_mean']:.3f})")
        if tq["margin"] < min_teacher_margin:
            raise ValueError(
                f"refreshed teacher margin {tq['margin']:.3f} < required "
                f"{min_teacher_margin}")
        # the rel-pair scores must come from the SAME teacher that scores
        # the negatives — MarginMSE margins are rel minus neg
        rel_path = ws.path("qid_to_reldocid_to_score.refresh.json")
        if not rel_path.exists():
            rel_pairs = [(str(q), str(d)) for q, rels in qrel.items()
                         for d, r in rels.items() if r > 0]
            rel_path.write_text(json.dumps(teacher_pair_scores(rel_pairs)))
        qid_to_reldocid_to_score = json.loads(rel_path.read_text())

    t1 = _teacher_trainset(ws, "pretrain_trainset_1.jsonl", run0,
                           teacher_pair_scores, qid_to_reldocid_to_score,
                           top_k=trainset_topk)
    if teacher_refresh:
        tmrr1 = _trainset_mrr(t1, qrel)
        ws.log("refreshed teacher candidate-ranking MRR@10 (self-mined "
               f"run): {tmrr1:.4f}")
        if tmrr1 < min_teacher_mrr:
            raise ValueError(
                f"refreshed teacher candidate-ranking MRR@10 {tmrr1:.4f} < "
                f"required {min_teacher_mrr} — the distillation target "
                f"ranks worse than the gate (measured collapse at 0.747, "
                f"artifacts/teacher_strength.json); raise teacher geometry/"
                f"epochs or widen the negative pool")
    params = _pretrain_stage("phase1_pretrain_1", t1, params)
    # snapshot: the phase-2 MM candidate run below must score queries with
    # THIS model (the one that encoded the corpus), not the post-codebook
    # post-seq2seq params — the reference reuses the stage-1 run verbatim
    params_stage1 = params

    # ---- DocID build ------------------------------------------------------
    embs = stage_encode_corpus(ws, model, params, docs, tok, max_length=64,
                               batch_size=batch_size)
    codes = stage_build_docids(ws, embs, docs.ids, M=cfg.M, K=cfg.K)
    params = stage_install_codebooks(ws, params)
    docids, codes = load_docid_to_smtid(ws.path("docid_to_smtid.json"))
    d2c = dict(zip(docids, codes))

    # ---- phase 2: seq2seq (pseudo-queries) + teacher MarginMSE ------------
    s2s_path = (query_to_docid_path
                or _pseudo_query_trainset(ws, docs, queries, qrel,
                                          teacher_pair_scores,
                                          per_doc=pseudo_queries_per_doc,
                                          seed=seed))
    s2s = Seq2SeqExamples(s2s_path)
    bz = min(batch_size, len(s2s))
    tcfg = TrainConfig(loss_type="t5seq_aq_encoder_seq2seq",
                       learning_rate=1e-3,
                       total_steps=_epochs_steps(len(s2s), bz, s2s_epochs))
    params = stage_train(
        ws, "phase2_seq2seq", model, params, tcfg,
        batches_from_seq2seq(s2s, Seq2SeqCollator(tok, d2c, max_length=32),
                             bz, epochs=s2s_epochs, drop_last=False),
        cfg, rng_seed=seed)

    # MarginMSE on the stage-1 model's retrieval, teacher-rescored (the
    # reference reuses t5_docid_gen_encoder_1's qrel_added run for
    # seq2seq_1, full_train_t5seq_seq2seq_0_1_pipeline.sh:55)
    run1 = _dense_run(ws, "dense_run_phase1_1.json", embs, model,
                      params_stage1, tok, queries, docids,
                      topk=retrieve_topk, batch_size=batch_size)
    mm_path = _teacher_trainset(ws, "phase2_mm_trainset.jsonl", run1,
                                teacher_pair_scores,
                                qid_to_reldocid_to_score,
                                top_k=trainset_topk)
    if calibrate_teacher_scale:
        from ripor_tpu.train.calibrate import calibrate_trainset
        cal = ws.path("phase2_mm_trainset.cal.jsonl")
        if not cal.exists():
            stats = calibrate_trainset(
                str(mm_path), str(cal), model, params, tok, queries,
                docid_to_codes=d2c, smtid_as_docid=False,
                alphas_out=str(ws.path("calibration_phase2_mm.json")),
                seed=seed)
            ws.log(f"phase2 MM scale calibration: alpha={stats['alpha']:.3f}"
                   f" (student margin {stats['student_margin_mean']:.1f}"
                   f"±{stats['student_margin_std']:.1f}, teacher "
                   f"{stats['teacher_margin_mean']:.1f}"
                   f"±{stats['teacher_margin_std']:.1f})")
        mm_path = str(cal)
    mm = TeacherScoreExamples(mm_path)
    bz = min(batch_size, len(mm))
    # lr 1e-4 per the reference (full_train_t5seq_seq2seq_0_1_pipeline.sh:58)
    tcfg = TrainConfig(loss_type="t5seq_aq_encoder_margin_mse",
                       learning_rate=mm_lr,
                       total_steps=_epochs_steps(len(mm), bz, mm_epochs))
    params = stage_train(
        ws, "phase2_margin_mse", model, params, tcfg,
        batches_from_teacher_examples(
            mm, MarginMSECollator(tok, queries, d2c, max_length=64), bz,
            epochs=mm_epochs, drop_last=False),
        cfg, rng_seed=seed)

    trie = stage_build_trie(ws, codes, cfg.K)

    def _eval_phase(tag: str, p) -> Dict[str, Dict[str, float]]:
        out = {tag: stage_evaluate(
            ws, stage_retrieve(ws, cfg, p, tok, queries, trie, docids,
                               num_beams=num_beams, topk=topk,
                               run_name=f"run_{tag}.json"),
            qrel, perf_name=f"perf_{tag}.json")}
        for plen in prefix_eval:
            ptrie = stage_build_prefix_trie(ws, codes, cfg.K, plen)
            prun = stage_retrieve(ws, cfg, p, tok, queries, ptrie, docids,
                                  num_beams=num_beams, topk=topk,
                                  run_name=f"run_{tag}_prefix{plen}.json",
                                  max_steps=plen)
            out[f"{tag}_prefix{plen}"] = stage_evaluate(
                ws, prun, qrel, perf_name=f"perf_{tag}_prefix{plen}.json")
        return out

    metrics = _eval_phase("phase2", params)

    # ---- phase 3: flywheel + prefix curriculum ----------------------------
    # D^R seeds: the CURRENT model's dense retrieval top-dr_topk + qrel
    # positives (reference retrieve_train_queries -> teacher rerank ->
    # add_qrel -> group by prefix; SURVEY.md §3.5)
    embs2 = stage_encode_corpus(ws, model, params, docs, tok, max_length=64,
                                batch_size=batch_size,
                                out_name="doc_embeds_phase2.npy")
    run2 = _dense_run(ws, "dense_run_phase2.json", embs2, model, params,
                      tok, queries, docids, topk=min(dr_topk, len(docids)),
                      batch_size=batch_size)
    qid_to_docids: Dict[str, List[str]] = {}
    for qid in queries.ids:
        pos = [str(d) for d, r in qrel.get(str(qid), {}).items() if r > 0]
        cand = [d for d in run2.get(str(qid), {}) if d not in set(pos)]
        if pos or cand:
            qid_to_docids[str(qid)] = pos + cand

    # pseudo-queries as rank-training positives (see docstring): every doc
    # gets an upward rank gradient from its own (teacher-filtered) pseudo-
    # queries; beam mining inside datagen_round supplies their negatives
    q3, score3 = queries, teacher_pair_scores
    if phase3_pseudo_rank > 0:
        from ripor_tpu.pipeline.flywheel import read_jsonl
        pq_texts: Dict[str, str] = {}
        per_doc_n: Dict[str, int] = {}
        train_texts = set(queries.texts)
        for i, r in enumerate(read_jsonl(str(s2s_path))):
            d = str(r["docid"])
            if r["query"] in train_texts:
                continue  # train-query rows ride along in the s2s set
                          # (_pseudo_query_trainset) and are already in
                          # qid_to_docids under their real qid
            if per_doc_n.get(d, 0) >= phase3_pseudo_rank:
                continue
            per_doc_n[d] = per_doc_n.get(d, 0) + 1
            pqid = f"pq{i}"
            pq_texts[pqid] = r["query"]
            qid_to_docids[pqid] = [d]
        q3 = _QueryOverlay(queries, pq_texts)
        score3 = lambda pairs: teacher_pair_scores(pairs, query_texts=q3)
        ws.log(f"phase3 pseudo-rank: +{len(pq_texts)} pseudo-queries "
               f"covering {len(per_doc_n)}/{len(docids)} docs")

    # L2-SP anchor = the phase-2 entry state: the rank stages' unopposed
    # drift on never-positive docs is the measured dev regression
    # (artifacts/phase3_dynamics_r5.md §2); a decoupled spring toward the
    # phase-2 params damps that drift without blocking data-supported
    # ranking movement (trainer.py l2sp_rate). Applied to the rank (mnt)
    # stages only — a rehearsal stage, when enabled, IS the restoring
    # mechanism and must stay free to move.
    anchor3 = params if phase3_l2sp > 0 else None

    for plen in curriculum:
        ds_path = ws.path(f"lng_knp_qid_smtids_scores_{plen}.train.json")
        if not ds_path.exists():
            ws.log(f"phase3 datagen at prefix {plen}")
            merged, rankdata, pair_scores = datagen_round(
                cfg, params, tok, q3, qid_to_docids, codes, docids,
                score3, prefix_len=plen,
                num_beams=datagen_num_beams or min(num_beams, 10),
                batch_size=4, decay=decay, return_intermediates=True)
            if phase3_sym_neg:
                from ripor_tpu.pipeline.datagen import (
                    attach_lng_knp_scores, merge_self_neg_sym_neg,
                    prefix_smtid_strings)
                p_str = prefix_smtid_strings(codes, docids, plen)
                # symmetric hard negatives per (qid, rel docid): the
                # query's teacher-scored candidates (the reference's
                # symmetric_hard_neg artifact holds the POSITIVE's dense
                # neighbours; at slice scale the query's own candidates are
                # that neighbourhood — both are rescored by the teacher)
                q2rank = {}
                for qid, rels in qid_to_reldocid_to_score.items():
                    if qid not in rankdata:
                        continue
                    cands = [[d, s] for d, s in
                             pair_scores.get(qid, {}).items()]
                    q2rank[qid] = {d: cands for d in rels}
                merged = merge_self_neg_sym_neg(
                    q2rank, qid_to_reldocid_to_score, rankdata, p_str,
                    max_new_token=plen, decay=decay)
                if plen > 4:
                    merged = attach_lng_knp_scores(merged, plen)
            write_jsonl(str(ds_path), merged)
        train_path = ds_path
        if calibrate_teacher_scale:
            from ripor_tpu.train.calibrate import calibrate_trainset
            cal = ws.path(
                f"lng_knp_qid_smtids_scores_{plen}.train.cal.json")
            if not cal.exists():
                plens = (tuple(p for p in (4, 8, 16) if p < plen)
                         if (phase3_prefix_heads and plen >= 8) else ())
                stats = calibrate_trainset(
                    str(ds_path), str(cal), model, params, tok, q3,
                    smtid_as_docid=True, prefix_lengths=plens,
                    alphas_out=str(ws.path(f"calibration_phase3_{plen}.json")),
                    seed=seed + plen)
                alphas = {k: round(v, 3) for k, v in stats.items()
                          if k.startswith("alpha")}
                ws.log(f"phase3 prefix-{plen} scale calibration: {alphas}")
            train_path = cal
        examples = TeacherScoreExamples(train_path, smtid_as_docid=True)
        if plen >= 8 and phase3_prefix_heads:
            loss_type = "t5seq_aq_encoder_lng_knp_margin_mse"
            prefix = examples.prefix_lengths_present()
        else:
            # sub-smtid stage, or phase3_prefix_heads=False — the paper's
            # "w/o prefix-oriented" flat ablation trains the FULL-length
            # margin only (no rank_4/8/16 heads)
            loss_type = "t5seq_aq_encoder_margin_mse"
            prefix = ()
        coll = MarginMSECollator(tok, q3, None, max_length=64,
                                 smtid_as_docid=True, prefix_lengths=prefix)
        bz = min(batch_size, len(examples))
        if phase3_joint_seq2seq:
            # the declared joint config (reference arguments.py:97):
            # lng_knp rank margins + a seq2seq sub-batch per step. With no
            # prefix keys present (plen=4 sub-smtid stage, or the flat
            # ablation) the lng_knp term reduces exactly to the full
            # margin, so one joint loss covers every stage.
            loss_type = "t5seq_aq_encoder_lng_knp_margin_mse_and_seq2seq"
        # lr 1e-4 per the reference (full_lng_knp_train_pipline.sh:31,85) —
        # MarginMSE first has to pull the student's raw score SCALE
        # (Σ_i⟨q_i,d_i⟩, O(100)) toward the teacher's logit scale (O(1));
        # at 5e-4 that transient destroys the seq2seq-built ranking before
        # the margins can be fit (measured: phase-3 mrr collapse at toy
        # scale)
        tcfg = TrainConfig(loss_type=loss_type, learning_rate=phase3_lr,
                           total_steps=_epochs_steps(len(examples), bz,
                                                     phase3_epochs),
                           l2sp_rate=phase3_l2sp,
                           loss_weights=(
                               {"seq2seq": phase3_joint_weight}
                               if (phase3_joint_seq2seq
                                   and phase3_joint_weight != 1.0)
                               else None))
        rank_batches = batches_from_teacher_examples(examples, coll, bz,
                                                     epochs=phase3_epochs,
                                                     drop_last=False)
        if phase3_joint_seq2seq:
            from ripor_tpu.data import batches_from_joint
            rank_batches = batches_from_joint(
                rank_batches, s2s, Seq2SeqCollator(tok, d2c, max_length=32),
                min(batch_size, len(s2s)), seed=seed + 500 + plen)
        params = stage_train(
            ws, f"phase3_mnt_{plen}", model, params, tcfg,
            rank_batches, cfg, rng_seed=seed + plen,
            anchor_params=anchor3)
        if phase3_seq2seq_rehearsal:
            # one seq2seq pass over the phase-2 trainset (pseudo-queries
            # for ALL docs + train queries) after each rank stage: rank
            # training moves the shared codebooks and the doc->smtid
            # mapping of non-replayed docs decays (measured at medium
            # proof scale: each phase-3 stage costs 0.01-0.03 held-out
            # MRR@10 even with a gated teacher + scale calibration, and a
            # post-hoc seq2seq pass recovers all of it — 0.265 -> 0.294).
            # This is the alternating form of the reference's DECLARED
            # rank+seq2seq config t5seq_aq_encoder_lng_knp_margin_mse_
            # and_seq2seq (arguments.py:97 — whitelisted but its model
            # class was never shipped).
            bz_r = min(batch_size, len(s2s))
            rhs_steps = _epochs_steps(len(s2s), bz_r,
                                      phase3_rehearsal_epochs)
            if phase3_rehearsal_max_steps > 0:
                rhs_steps = min(rhs_steps, phase3_rehearsal_max_steps)
            rcfg = TrainConfig(
                loss_type="t5seq_aq_encoder_seq2seq",
                learning_rate=phase3_rehearsal_lr,
                total_steps=rhs_steps)
            rhs_batches = batches_from_seq2seq(
                s2s, Seq2SeqCollator(tok, d2c, max_length=32), bz_r,
                epochs=phase3_rehearsal_epochs, drop_last=False)
            if phase3_rehearsal_max_steps > 0:
                rhs_batches = itertools.islice(rhs_batches, rhs_steps)
            params = stage_train(
                ws, f"phase3_s2s_rhs_{plen}", model, params, rcfg,
                rhs_batches, cfg, rng_seed=seed + 1000 + plen)

    # final checkpoint under the conventional name for the retrieve CLI
    final = ws.path("checkpoints/final")
    if not (final / "params").exists():
        from ripor_tpu.train import save_params
        save_params(final, params, cfg)

    metrics.update(_eval_phase("phase3", params))
    ws.log(f"full recipe metrics: {metrics}")
    return metrics


def stage_build_prefix_trie(ws: Workspace, codes: np.ndarray, K: int,
                            prefix_len: int):
    """Trie over prefix-truncated codes for sub-smtid retrieval (reference
    builds these per max_new_token, full_evaluate...sh:176-205)."""
    from ripor_tpu.trie import DocIdTrie, build_trie
    name = f"trie_prefix{prefix_len}.npz"
    if ws.has(name):
        return DocIdTrie.load(ws.path(name))
    trie = build_trie(np.ascontiguousarray(codes[:, :prefix_len]), K)
    trie.save(ws.path(name))
    return trie
