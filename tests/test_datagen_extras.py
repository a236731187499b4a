"""Flywheel glue parity — pseudo-query mapping, BCE examples, n-way labels,
truncation, qrel-first and symmetric-hard-negative merges (reference
aq_preprocess/{create_pseudo_query_to_docid_map, build_bce_example...,
create_nway_dataset..., truncate_lng_knp_json_example,
add_qrel_first_create_json_example, merge_self_neg_sym_neg...}.py)."""
import numpy as np

from ripor_tpu.pipeline.datagen import (
    DECAY_TO_FACTOR,
    add_qrel_examples,
    build_bce_examples,
    merge_self_neg_sym_neg,
    nway_dataset,
    nway_labels,
    pseudo_query_examples,
    qrel_first_examples,
    truncate_examples,
)


def test_pseudo_query_examples_filtering():
    d2r = {"d1": {"pq1": 2.0, "pq2": 0.5}, "d2": {"pq3": 1.5}}
    q2t = {"pq1": "alpha", "pq2": "beta", "pq3": "gamma"}
    all_ex, filt = pseudo_query_examples(d2r, q2t)
    assert len(all_ex) == 3
    assert {e["query"] for e in filt} == {"alpha", "gamma"}  # score > 1.0
    assert all_ex[0] == {"docid": "d1", "query": "alpha"}


def test_build_bce_examples_balance():
    qrel = {"q1": {"d0": 1}}
    run = {"q1": {f"d{i}": 10.0 - i for i in range(20)}}
    ex = build_bce_examples(qrel, run, neg_sample=5,
                            rng=np.random.default_rng(0))
    assert len(ex) == 10  # 5 pos + 5 neg interleavings, shuffled
    pos = [e for e in ex if e[2] == 1]
    neg = [e for e in ex if e[2] == 0]
    assert len(pos) == len(neg) == 5
    assert all(e[1] == "d0" for e in pos)


def test_nway_labels_template():
    labels = nway_labels(12)
    assert labels == [1.0, 0.5, 1 / 3, 0.25, 0.2, 0, 0, 0, 0, 0, -0.5, -0.5]


def test_nway_dataset_skips_short():
    exs = [
        {"qid": "a", "docids": [f"d{i}" for i in range(12)],
         "scores": sorted(np.arange(12.0), reverse=True)},
        {"qid": "b", "docids": ["d0"], "scores": [1.0]},
    ]
    out = nway_dataset(exs, nway=12)
    assert len(out) == 1 and out[0]["qid"] == "a"
    assert out[0]["labels"] == nway_labels(12)


def test_truncate_examples_all_list_fields():
    exs = [{"qid": "q", "smtids": list("abcde"),
            "scores": [5, 4, 3, 2, 1], "smtid_4_scores": [9, 8, 7, 6, 5]}]
    out = truncate_examples(exs, 3)
    assert out[0]["smtids"] == ["a", "b", "c"]
    assert out[0]["scores"] == [5, 4, 3]
    assert out[0]["smtid_4_scores"] == [9, 8, 7]
    assert out[0]["qid"] == "q"


def test_qrel_first_examples_semantics():
    d2s = {"dp": "1_2", "dn": "3_4"}
    rel_scores = {"q1": {"dp": 10.0}, "q2": {"dp": 5.0}}  # q2 not in rankdata
    rankdata = {"q1": {"3_4": [["dn", 8.0], ["dn2", 6.0]],
                       "5_6": [["dx", 4.0]]}}
    out = qrel_first_examples(rel_scores, d2s, rankdata,
                              max_new_token=4, decay=2)
    assert len(out) == 1  # q2 skipped
    ex = out[0]
    f = DECAY_TO_FACTOR[2][4]  # 0.5
    # positive first with UNDECAYED score, then decayed max-per-smtid desc
    assert ex["smtids"] == ["1_2", "3_4", "5_6"]
    assert ex["scores"] == [10.0, 8.0 * f, 4.0 * f]


def test_merge_self_neg_sym_neg_union_and_cap():
    d2s = {"dp": "1", "da": "2", "db": "3", "dc": "4"}
    sym = {"q": {"dp": [["da", 8.0], ["db", 6.0]]}}
    rel_scores = {"q": {"dp": 20.0}}
    self_rank = {"q": {"3": [["db", 10.0]], "4": [["dc", 2.0]]}}
    out = merge_self_neg_sym_neg(sym, rel_scores, self_rank, d2s,
                                 max_new_token=4, decay=2, threshold=3)
    assert len(out) == 1
    ex = out[0]
    # smtid "3" appears in both sources: max(6*0.5, 10*0.5) = 5.0
    assert ex["smtids"][0] == "1" and ex["scores"][0] == 20.0
    assert ex["smtids"][1] == "3" and ex["scores"][1] == 5.0
    assert len(ex["smtids"]) == 3  # capped at threshold
    assert ex["smtids"][2] == "2" and ex["scores"][2] == 4.0


def test_add_qrel_examples_dedupe():
    d2s = {"dp": "1", "dn": "2"}
    rel = {"q": {"dp": 9.0}}
    # positive already present in rankdata -> unchanged order, decayed scores
    out = add_qrel_examples(rel, d2s, {"q": {"1": [["dp", 4.0]],
                                             "2": [["dn", 2.0]]}}, 4, 2)
    assert out[0]["smtids"] == ["1", "2"]
    assert out[0]["scores"] == [2.0, 1.0]
    # positive absent -> prepended with undecayed qrel score
    out = add_qrel_examples(rel, d2s, {"q": {"2": [["dn", 2.0]]}}, 4, 2)
    assert out[0]["smtids"] == ["1", "2"]
    assert out[0]["scores"] == [9.0, 1.0]


def test_teacher_run_to_examples_sort_and_cut():
    from ripor_tpu.pipeline.datagen import teacher_run_to_examples
    scored = {"q": {"d1": 3.0, "d2": 9.0, "d3": 5.0}}
    out = teacher_run_to_examples(scored, top_k=2)
    assert out == [{"qid": "q", "docids": ["d2", "d3"],
                    "scores": [9.0, 5.0]}]


def test_qrel_added_teacher_examples_prepend_vs_keep():
    from ripor_tpu.pipeline.datagen import qrel_added_teacher_examples
    exs = [{"qid": "q1", "docids": ["a", "b"], "scores": [5.0, 3.0]},
           {"qid": "q2", "docids": ["c"], "scores": [2.0]},
           {"qid": "q3", "docids": ["d"], "scores": [1.0]}]
    rels = {"q1": {"a": 7.0},          # present -> row unchanged
            "q2": {"x": 9.0},          # absent  -> prepended w/ qrel score
            # q3 has no qrel entry -> dropped (reference indexes the dict)
            }
    out = qrel_added_teacher_examples(exs, rels)
    assert out == [
        {"qid": "q1", "docids": ["a", "b"], "scores": [5.0, 3.0]},
        {"qid": "q2", "docids": ["x", "c"], "scores": [9.0, 2.0]},
    ]


def test_bm25_ranks_exact_term_matches_first():
    from ripor_tpu.evaluation.bm25 import BM25Index
    docs = ["apple banana cherry", "apple apple apple",
            "dog cat mouse", "banana split"]
    idx = BM25Index(docs)
    scores, hits = idx.search("apple", topk=4)
    assert hits[0] == 1                      # tf saturation still ranks it up
    assert set(hits) == {0, 1}               # only docs containing the term
    assert (np.diff(scores) <= 0).all()
    run = idx.run(["q"], ["banana split"], ["d0", "d1", "d2", "d3"], topk=2)
    assert list(run["q"]) [0] == "d3"        # both terms match


def test_bm25_idf_downweights_common_terms():
    from ripor_tpu.evaluation.bm25 import BM25Index
    docs = ["the quick fox", "the lazy dog", "the old cat", "rare gem here"]
    idx = BM25Index(docs)
    s_rare, h_rare = idx.search("gem", topk=1)
    s_common, h_common = idx.search("the", topk=1)
    assert s_rare[0] > s_common[0]
