"""D^B prefix candidate generation + trainset creation + full flywheel loop."""
import jax
import jax.numpy as jnp
import numpy as np

from ripor_tpu.data import HashTokenizer
from ripor_tpu.models import RiporModel, ripor_small
from ripor_tpu.pipeline.datagen import (
    group_docids_by_prefix,
    merge_rankdata_with_decay,
    prefix_smtid_strings,
)
from ripor_tpu.pipeline.flywheel import beam_prefix_candidates, create_trainset


def test_beam_prefix_candidates():
    cfg = ripor_small(M=8, K=16)
    model = RiporModel(cfg)
    rng = np.random.default_rng(0)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.ones((1, 6), jnp.int32), jnp.ones((1, 6), jnp.int32),
                        jnp.zeros((1, 8), jnp.int32))["params"]
    doc_codes = rng.integers(0, 16, (60, 8))
    docids = [f"d{i}" for i in range(60)]
    out = beam_prefix_candidates(
        cfg, params, HashTokenizer(500), ["q0", "q1"], ["hello", "world"],
        doc_codes, docids, prefix_len=4, num_beams=5, batch_size=2,
        dtype=jnp.float32)
    assert set(out) == {"q0", "q1"}
    valid_prefixes = {"_".join(map(str, row[:4])) for row in doc_codes.tolist()}
    for qid, bucket in out.items():
        assert 0 < len(bucket) <= 5
        for prefix, docs in bucket.items():
            assert prefix in valid_prefixes
            # every doc in the bucket really has that prefix
            for d in docs:
                i = int(d[1:])
                assert "_".join(map(str, doc_codes[i, :4])) == prefix


def test_create_trainset_with_qrel():
    run = {"q0": {"a": 3.0, "b": 9.0, "c": 1.0}}
    qrel = {"q0": {"c": 1}}
    ex = create_trainset(run, qrel)
    assert ex[0]["docids"][0] == "c"           # relevant doc forced positive
    assert set(ex[0]["docids"]) == {"a", "b", "c"}
    ex2 = create_trainset(run)                 # no qrel: top score first
    assert ex2[0]["docids"][0] == "b"
    assert create_trainset({"q1": {"only": 1.0}}) == []


def test_full_flywheel_shapes():
    """D^R + D^B -> rerank-format -> decay merge end-to-end (host glue)."""
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 8, (30, 8))
    docids = [f"d{i}" for i in range(30)]
    p4 = prefix_smtid_strings(codes, docids, 4)
    d_r = group_docids_by_prefix({"q": docids[:10]}, p4)
    # pretend-teacher scores -> rankdata format
    rank_r = {"q": {smtid: [[d, float(10 - i)] for i, d in enumerate(docs)]
                    for smtid, docs in d_r["q"].items()}}
    rank_b = {"q": {list(rank_r["q"])[0]: [["d0", 99.0]]}}
    examples = merge_rankdata_with_decay(rank_r, rank_b, max_new_token=4, decay=2)
    assert examples[0]["qid"] == "q"
    assert examples[0]["scores"][0] == 99.0 * 0.5  # D^B max wins, decayed
