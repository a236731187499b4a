"""Data pipeline: tokenizer, readers (reference formats), collators."""
import json

import numpy as np
import pytest

from ripor_tpu.data import (
    Collection,
    HashTokenizer,
    MarginMSECollator,
    PretrainCollator,
    Seq2SeqCollator,
    Seq2SeqExamples,
    TeacherScoreExamples,
    UnigramTokenizer,
    batches_from_seq2seq,
    batches_from_teacher_examples,
    load_docid_to_smtid,
    parse_smtid_str,
    save_docid_to_smtid,
    smtid_to_str,
)


@pytest.fixture()
def tiny_data(tmp_path):
    docs = tmp_path / "docs"
    docs.mkdir()
    (docs / "raw.tsv").write_text(
        "d0\tthe quick brown fox\nd1\tretrieval systems rock\nd2\tanother passage here\n")
    queries = tmp_path / "queries"
    queries.mkdir()
    (queries / "raw.tsv").write_text("q0\tfox color\nq1\twhat rocks\n")
    d2s = {"d0": [-1, 1, 2], "d1": [-1, 3, 0], "d2": [-1, 1, 3]}
    (tmp_path / "docid_to_smtid.json").write_text(json.dumps(d2s))
    examples = [
        {"qid": "q0", "docids": ["d0", "d1", "d2"], "scores": [9.0, 3.0, 1.0],
         "smtid_4_scores": [4.5, 1.5, 0.5]},
        {"qid": "q1", "docids": ["d1", "d0", "d2"], "scores": [8.0, 2.0, 0.5],
         "smtid_4_scores": [4.0, 1.0, 0.25]},
    ]
    with open(tmp_path / "train.jsonl", "w") as f:
        for ex in examples:
            f.write(json.dumps(ex) + "\n")
    with open(tmp_path / "s2s.jsonl", "w") as f:
        f.write(json.dumps({"docid": "d0", "query": "fox color"}) + "\n")
        f.write(json.dumps({"docid": "d1", "query": "what rocks"}) + "\n")
    return tmp_path


def test_collection_and_docid_to_smtid(tiny_data):
    docs = Collection(tiny_data / "docs")
    assert len(docs) == 3 and docs["d1"] == "retrieval systems rock"
    docids, codes = load_docid_to_smtid(tiny_data / "docid_to_smtid.json")
    assert docids == ["d0", "d1", "d2"]
    np.testing.assert_array_equal(codes, [[1, 2], [3, 0], [1, 3]])
    # roundtrip keeps reference format (with -1 sentinel)
    save_docid_to_smtid(tiny_data / "rt.json", docids, codes)
    assert json.load(open(tiny_data / "rt.json"))["d0"] == [-1, 1, 2]


def test_smtid_strings():
    assert parse_smtid_str("3_0_7") == [3, 0, 7]
    assert smtid_to_str([3, 0, 7]) == "3_0_7"


def test_hash_tokenizer_batch():
    tok = HashTokenizer(1000)
    ids, mask = tok.encode_batch(["hello world", "a much longer sentence right here"], 5)
    assert ids.shape == (2, 5) and mask.shape == (2, 5)
    assert ids[0, 2] == 1  # EOS after 2 tokens
    assert mask[0].sum() == 3 and mask[1].sum() == 5
    # deterministic
    ids2, _ = tok.encode_batch(["hello world"], 5)
    np.testing.assert_array_equal(ids[0], ids2[0])


def test_unigram_tokenizer_train_save_load(tmp_path):
    corpus = ["the quick brown fox jumps", "retrieval with semantic ids",
              "documents and queries"] * 30
    tok = UnigramTokenizer.train(corpus, vocab_size=120)
    ids = tok.encode("quick retrieval")
    assert len(ids) > 0 and max(ids) < tok.vocab_size
    tok.save(tmp_path / "tok.json")
    tok2 = UnigramTokenizer.load(tmp_path / "tok.json")
    assert tok2.encode("quick retrieval") == ids


def test_marginmse_collator_and_iterator(tiny_data):
    queries = Collection(tiny_data / "queries")
    docids, codes = load_docid_to_smtid(tiny_data / "docid_to_smtid.json")
    d2c = {d: c for d, c in zip(docids, codes)}
    examples = TeacherScoreExamples(tiny_data / "train.jsonl")
    assert examples.prefix_lengths_present() == (4,)
    coll = MarginMSECollator(HashTokenizer(500), queries, d2c, max_length=8,
                             prefix_lengths=(4,))
    batches = list(batches_from_teacher_examples(examples, coll, batch_size=2,
                                                 epochs=2))
    assert len(batches) == 2
    b = batches[0]
    assert b["query_ids"].shape == (2, 8)
    assert b["pos_codes"].shape == (2, 2)
    assert b["teacher_pos_score"].dtype == np.float32
    assert "smtid_4_teacher_pos_score" in b
    # positives always index 0 of the example's docids
    assert set(b["teacher_pos_score"].tolist()) <= {9.0, 8.0}


def test_seq2seq_collator(tiny_data):
    docids, codes = load_docid_to_smtid(tiny_data / "docid_to_smtid.json")
    d2c = {d: c for d, c in zip(docids, codes)}
    examples = Seq2SeqExamples(tiny_data / "s2s.jsonl")
    coll = Seq2SeqCollator(HashTokenizer(500), d2c, max_length=6)
    batches = list(batches_from_seq2seq(examples, coll, batch_size=2))
    assert batches[0]["codes"].shape == (2, 2)


def test_pretrain_collator(tiny_data):
    queries = Collection(tiny_data / "queries")
    docs = Collection(tiny_data / "docs")
    docids, codes = load_docid_to_smtid(tiny_data / "docid_to_smtid.json")
    d2c = {d: c for d, c in zip(docids, codes)}
    coll = PretrainCollator(HashTokenizer(500), queries, docs, max_length=10,
                            docid_to_codes=d2c, prefix_len=2)
    samples = [{"qid": "q0", "pos": "d0", "neg": "d1",
                "pos_score": 1.0, "neg_score": 0.0}]
    b = coll(samples)
    assert b["pos_doc_ids"].shape == (1, 10)
    assert b["pos_prefix_codes"].shape == (1, 2)


def test_process_sharding(tiny_data):
    queries = Collection(tiny_data / "queries")
    docids, codes = load_docid_to_smtid(tiny_data / "docid_to_smtid.json")
    d2c = dict(zip(docids, codes))
    examples = TeacherScoreExamples(tiny_data / "train.jsonl")
    coll = MarginMSECollator(HashTokenizer(500), queries, d2c, max_length=8)
    b0 = list(batches_from_teacher_examples(examples, coll, 1, process_index=0,
                                            process_count=2))
    b1 = list(batches_from_teacher_examples(examples, coll, 1, process_index=1,
                                            process_count=2))
    assert len(b0) == 1 and len(b1) == 1  # disjoint shards of the 2 examples


def test_prefetch_loader_order_and_errors():
    from ripor_tpu.data.loader import PrefetchLoader, epoch_batches

    batches = [{"x": np.full((2,), i)} for i in range(10)]
    out = list(PrefetchLoader(batches, buffer=3))
    assert len(out) == 10
    for i, b in enumerate(out):
        assert b["x"][0] == i

    def bad():
        yield {"x": np.zeros(1)}
        raise ValueError("boom")
    it = iter(PrefetchLoader(bad(), buffer=2))
    next(it)
    try:
        next(it)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "boom" in str(e)

    eps = list(epoch_batches(lambda e: [{"e": np.full((1,), e)}] * 2, 3))
    assert [int(b["e"][0]) for b in eps] == [0, 0, 1, 1, 2, 2]


def test_device_prefetch_matches():
    import jax
    from ripor_tpu.data.loader import device_prefetch

    batches = [{"x": np.full((4,), i, np.float32)} for i in range(5)]
    out = list(device_prefetch(batches, size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_allclose(np.asarray(b["x"]), i)


def test_spm_model_import(tmp_path):
    """Load a real SentencePiece .model proto (the reference's T5 tokenizer
    format, dataset/dataloader.py:10) via UnigramTokenizer.from_spm: pieces,
    special-id layout (pad/eos/unk = 0/1/2), and Viterbi segmentation."""
    pytest.importorskip("transformers")
    from transformers.utils import sentencepiece_model_pb2_new as spm_pb

    from ripor_tpu.data.tokenizer import EOS_ID, PAD_ID, UnigramTokenizer

    m = spm_pb.ModelProto()

    def add(piece, score, ptype=1):
        p = m.pieces.add()
        p.piece, p.score, p.type = piece, score, ptype

    add("<pad>", 0.0, 3)
    add("</s>", 0.0, 3)
    add("<unk>", 0.0, 2)
    for w, s in [("▁hello", -1.0), ("▁world", -1.5), ("▁", -4.0),
                 ("he", -3.0), ("llo", -3.0), ("wor", -3.0), ("ld", -3.0)]:
        add(w, s)
    m.trainer_spec.unk_id = 2
    m.trainer_spec.byte_fallback = False
    path = tmp_path / "spiece.model"
    path.write_bytes(m.SerializeToString())

    tok = UnigramTokenizer.from_spm(path)
    assert tok.vocab_size == 10
    # whole-word pieces beat char splits (unigram Viterbi)
    assert tok.encode("hello world") == [3, 4]
    ids, mask = tok.encode_batch(["hello world"], 6)
    assert ids[0, 2] == EOS_ID and ids[0, 3] == PAD_ID
    assert mask[0].tolist() == [1, 1, 1, 0, 0, 0]


def test_word_tokenizer_deterministic_and_roundtrip(tmp_path):
    """WordTokenizer: deterministic vocab (frequency then lexicographic),
    save/load round-trip, and the recipe loader dispatches on file kind
    (the Rust Unigram trainer is unseeded; CI recipes need this one)."""
    from ripor_tpu.data.tokenizer import UNK_ID, WordTokenizer
    from ripor_tpu.pipeline.recipe import load_tokenizer

    corpus = ["red blue blue", "green red blue", "zeta"]
    t1 = WordTokenizer.train(corpus, vocab_size=8)
    t2 = WordTokenizer.train(list(reversed(corpus)), vocab_size=8)
    assert t1.encode("blue red green zeta") == t2.encode("blue red green zeta")
    # blue(3) < red(2) < green(1)/zeta(1) lexicographic
    ids = t1.encode("blue red green zeta unknownword")
    assert ids[:2] == [5, 6] and ids[-1] == UNK_ID
    p = tmp_path / "tok.json"
    t1.save(p)
    t3 = load_tokenizer(p)
    assert type(t3).__name__ == "WordTokenizer"
    assert t3.encode("blue red") == t1.encode("blue red")
    assert t3.vocab_size == t1.vocab_size
