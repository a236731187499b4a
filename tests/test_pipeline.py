"""Datagen decay-merge parity + the full end-to-end slice on CPU."""
import json

import numpy as np
import pytest

from ripor_tpu.pipeline.datagen import (
    DECAY_TO_FACTOR,
    attach_lng_knp_scores,
    expand_prefix_rankdata,
    group_docids_by_prefix,
    merge_rankdata_with_decay,
    prefix_smtid_strings,
)


def test_decay_factors_exact():
    # reference get_qid_smtids_scores_jsonl_examples.py:9-16
    assert DECAY_TO_FACTOR[2][4] == 0.5
    assert DECAY_TO_FACTOR[2][8] == 0.75
    assert DECAY_TO_FACTOR[2][16] == 0.875
    assert DECAY_TO_FACTOR[2][32] == 1.0


def test_merge_rankdata_semantics():
    original = {"q1": {"1_2": [["d0", 10.0], ["d1", 8.0]],
                       "3_4": [["d2", 6.0]]}}
    self_data = {"q1": {"1_2": [["d0", 20.0]],      # collision -> max
                        "5_6": [["d3", 4.0]]}}      # new smtid joins
    ex = merge_rankdata_with_decay(original, self_data, max_new_token=4,
                                   decay=2)
    assert len(ex) == 1
    e = ex[0]
    assert e["qid"] == "q1"
    scores = dict(zip(e["smtids"], e["scores"]))
    assert scores["1_2"] == pytest.approx(10.0)  # max(10*0.5, 20*0.5)
    assert scores["3_4"] == pytest.approx(3.0)
    assert scores["5_6"] == pytest.approx(2.0)
    assert e["scores"] == sorted(e["scores"], reverse=True)


def test_merge_top100_truncation_before_union():
    original = {"q": {f"s{i}": [[f"d{i}", float(1000 - i)]] for i in range(150)}}
    self_data = {"q": {"extra": [["dx", 0.5]]}}
    ex = merge_rankdata_with_decay(original, self_data, 32, decay=2)[0]
    assert len(ex["smtids"]) == 101  # 100 from D^R + 1 new from D^B
    assert "extra" in ex["smtids"]


def test_attach_lng_knp_scores():
    ex = [{"qid": "q", "smtids": ["1_2"], "scores": [8.0]}]
    out = attach_lng_knp_scores(ex, max_new_token=32)
    assert out[0]["smtid_4_scores"] == [4.0]
    assert out[0]["smtid_8_scores"] == [6.0]
    assert out[0]["smtid_16_scores"] == [7.0]
    out16 = attach_lng_knp_scores(ex, max_new_token=16)
    assert out16[0]["smtid_4_scores"][0] == pytest.approx(8.0 * 0.5 / 0.875)


def test_group_and_expand():
    codes = np.array([[1, 2, 3, 4], [1, 2, 9, 9], [5, 5, 5, 5]])
    docids = ["a", "b", "c"]
    p2 = prefix_smtid_strings(codes, docids, 2)
    assert p2 == {"a": "1_2", "b": "1_2", "c": "5_5"}
    grouped = group_docids_by_prefix({"q": ["a", "b", "c"]}, p2)
    assert grouped == {"q": {"1_2": ["a", "b"], "5_5": ["c"]}}
    full = prefix_smtid_strings(codes, docids, 4)
    rank16 = {"q": {"1_2": [["a", 3.0], ["b", 2.0]]}}
    expanded = expand_prefix_rankdata(rank16, full)
    assert expanded == {"q": {"1_2_3_4": [["a", 3.0]], "1_2_9_9": [["b", 2.0]]}}


@pytest.mark.slow
def test_e2e_slice(tmp_path):
    """The minimum end-to-end slice: 40 docs, 12 queries, seq2seq overfit,
    constrained retrieval must rank the relevant doc near the top."""
    from ripor_tpu.pipeline.e2e import run_e2e

    rng = np.random.default_rng(0)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
             "hotel", "india", "juliet", "kilo", "lima", "mike", "november"]
    docs_dir = tmp_path / "docs"; docs_dir.mkdir()
    n_docs = 40
    doc_texts = []
    with open(docs_dir / "raw.tsv", "w") as f:
        for i in range(n_docs):
            text = " ".join(rng.choice(words, 6)) + f" topic{i}"
            doc_texts.append(text)
            f.write(f"d{i}\t{text}\n")
    queries_dir = tmp_path / "queries"; queries_dir.mkdir()
    qrel = {}
    with open(queries_dir / "raw.tsv", "w") as f:
        for qi in range(12):
            di = qi * 3
            f.write(f"q{qi}\tfind topic{di} {doc_texts[di].split()[0]}\n")
            qrel[f"q{qi}"] = {f"d{di}": 1}
    qrel_path = tmp_path / "qrel.json"
    qrel_path.write_text(json.dumps(qrel))

    metrics = run_e2e(workspace=str(tmp_path / "ws"), docs_dir=str(docs_dir),
                      queries_dir=str(queries_dir), qrel_path=str(qrel_path),
                      M=4, K=16, vocab_size=300, s2s_epochs=60,
                      learning_rate=2e-3, batch_size=12, num_beams=5, topk=20)
    # seq2seq overfit on (query -> relevant doc smtid): training queries must
    # retrieve their doc's smtid
    assert metrics["mrr_10"] > 0.5, metrics
    assert metrics["recall_10"] > 0.5, metrics


def test_pipeline_runner_resume(tmp_path):
    """Stages run once, skip when complete, re-run via --from, and fail on
    missing declared outputs."""
    from ripor_tpu.pipeline.runner import run_pipeline

    calls = []
    out_a = tmp_path / "a.txt"

    def fake_cli(argv):
        calls.append(argv[0])
        if argv[0] == "a":
            out_a.write_text("x")

    spec = {"workspace": str(tmp_path), "stages": [
        {"name": "a", "argv": ["a"], "outputs": [str(out_a)]},
        {"name": "b", "argv": ["b"]},
    ]}
    ran = run_pipeline(spec, cli_main=fake_cli, log=lambda m: None)
    assert ran == ["a", "b"] and calls == ["a", "b"]

    ran = run_pipeline(spec, cli_main=fake_cli, log=lambda m: None)
    assert ran == [] and calls == ["a", "b"]  # all skipped

    out_a.unlink()  # missing output -> stage re-runs
    ran = run_pipeline(spec, cli_main=fake_cli, log=lambda m: None)
    assert ran == ["a"]

    ran = run_pipeline(spec, cli_main=fake_cli, from_stage="b",
                       log=lambda m: None)
    assert ran == ["b"]

    bad = {"workspace": str(tmp_path), "stages": [
        {"name": "c", "argv": ["c"], "outputs": [str(tmp_path / "never")]}]}
    import pytest
    with pytest.raises(RuntimeError, match="outputs missing"):
        run_pipeline(bad, cli_main=fake_cli, log=lambda m: None)
