"""Serving engine: warm-shape padding, microbatching, HTTP front end.

The engine wraps the same decode path stage_retrieve uses offline
(reference evaluate.py:457-526), so parity is asserted against a direct
make_beam_search_fn call."""
import http.client
import json
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ripor_tpu.data.tokenizer import HashTokenizer, tokenize_queries
from ripor_tpu.decode import expand_groups_to_docids
from ripor_tpu.decode.beam import make_beam_search_fn
from ripor_tpu.models import RiporModel, ripor_small
from ripor_tpu.serve import RetrievalEngine, ServeConfig
from ripor_tpu.serve.http import serve_http
from ripor_tpu.trie import build_trie, succinct_tables


@pytest.fixture(scope="module")
def tiny_engine():
    cfg = ripor_small(M=4, K=8)
    model = RiporModel(cfg)
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(1, 100, (2, 6)), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(7)}, ids,
                        jnp.ones_like(ids),
                        jnp.zeros((2, 4), jnp.int32))["params"]
    codes = rng.integers(0, 8, (40, 4))
    trie = build_trie(codes, 8)
    docids = [f"d{i}" for i in range(40)]
    tok = HashTokenizer(100)
    scfg = ServeConfig(num_beams=5, topk=7, max_length=6,
                       batch_sizes=(1, 2, 4), max_delay_ms=50.0,
                       param_dtype=None)   # exact parity vs f32 reference
    eng = RetrievalEngine(cfg, params, tok, trie, docids, scfg)
    return eng, cfg, params, tok, trie, docids


QUERIES = ["what is jax", "tpu systolic array", "residual quantization",
           "beam search", "semantic ids", "msmarco passages"]


def _direct(cfg, params, tok, trie, docids, texts, scfg):
    """The offline formulation (stage_retrieve's body) at one warm shape."""
    fn = make_beam_search_fn(cfg, scfg.num_beams, constrained=True)
    tables = jax.tree.map(jnp.asarray, succinct_tables(trie))
    rung = next(b for b in (1, 2, 4) if b >= len(texts))
    ids, mask = tokenize_queries(tok, texts + [""] * (rung - len(texts)),
                                 scfg.max_length)
    scores, codes, state = fn(params, jnp.asarray(ids), jnp.asarray(mask),
                              tables)
    scores, state = np.asarray(scores), np.asarray(state)
    groups = np.where(state <= -2, -2 - state, -1)
    out = []
    for bi in range(len(texts)):
        docs, ss = expand_groups_to_docids(trie, groups[bi], scores[bi],
                                           scfg.topk)
        out.append([(docids[d], float(v)) for d, v in zip(docs, ss)])
    return out


def test_engine_matches_offline_path(tiny_engine):
    eng, cfg, params, tok, trie, docids = tiny_engine
    got = eng.retrieve_batch(QUERIES[:3])
    want = _direct(cfg, params, tok, trie, docids, QUERIES[:3], eng.scfg)
    assert len(got) == 3
    for g, w in zip(got, want):
        assert [d for d, _ in g] == [d for d, _ in w]
        np.testing.assert_allclose([s for _, s in g], [s for _, s in w],
                                   rtol=1e-5)
        # scores descend and respect topk
        ss = [s for _, s in g]
        assert ss == sorted(ss, reverse=True) and len(g) <= eng.scfg.topk


def test_engine_splits_oversize_batches(tiny_engine):
    eng, cfg, params, tok, trie, docids = tiny_engine
    got = eng.retrieve_batch(QUERIES)          # 6 > max rung 4 -> two calls
    one_by_one = [eng.retrieve_batch([q])[0] for q in QUERIES]
    assert got == one_by_one


def test_microbatcher_coalesces_and_matches(tiny_engine):
    eng, cfg, params, tok, trie, docids = tiny_engine
    served0 = eng.stats()["served"]
    futures = [eng.submit(q) for q in QUERIES]  # enqueue BEFORE start
    eng.start()
    try:
        got = [f.result(timeout=120) for f in futures]
    finally:
        eng.stop()
    want = [eng.retrieve_batch([q])[0] for q in QUERIES]
    assert got == want
    st = eng.stats()
    assert st["served"] >= served0 + len(QUERIES)
    # the pre-filled queue must coalesce into multi-query device batches
    assert any(r > 1 for r in st["batch_hist"])
    assert st["p50_s"] is not None and st["p99_s"] >= st["p50_s"]


def test_mesh_engine_matches_single_device(tiny_engine, mesh8):
    """Pod serving: a mesh-backed engine (DP-sharded decode) returns the
    same results as the single-device engine, and rejects rungs that do
    not divide the data axis."""
    eng, cfg, params, tok, trie, docids = tiny_engine
    from ripor_tpu.serve import RetrievalEngine

    scfg = ServeConfig(num_beams=5, topk=7, max_length=6,
                       batch_sizes=(4,), max_delay_ms=50.0,
                       param_dtype=None)
    mesh_eng = RetrievalEngine(cfg, params, tok, trie, docids, scfg,
                               mesh=mesh8)
    got = mesh_eng.retrieve_batch(QUERIES[:3])   # pads 3 -> rung 4
    want = eng.retrieve_batch(QUERIES[:3])
    for g, w in zip(got, want):
        assert [d for d, _ in g] == [d for d, _ in w]
        np.testing.assert_allclose([s for _, s in g], [s for _, s in w],
                                   rtol=1e-4)
    with pytest.raises(ValueError, match="data"):
        RetrievalEngine(cfg, params, tok, trie, docids,
                        ServeConfig(num_beams=5, batch_sizes=(3,)),
                        warm=False, mesh=mesh8)


def test_stop_fails_queued_requests(tiny_engine):
    """Shutdown must not leave queued futures hanging forever."""
    eng, *_ = tiny_engine
    f = eng.submit("orphaned query")      # batcher never started
    eng.stop()
    with pytest.raises(RuntimeError, match="stopped"):
        f.result(timeout=5)


def test_dense_engine_matches_dense_topk():
    from ripor_tpu.evaluation.retriever import dense_topk
    from ripor_tpu.serve import DenseEngine

    cfg = ripor_small(M=4, K=8)
    model = RiporModel(cfg)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(1, 100, (2, 6)), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(3)}, ids,
                        jnp.ones_like(ids),
                        jnp.zeros((2, 4), jnp.int32))["params"]
    corpus = rng.standard_normal((64, cfg.t5.d_model)).astype(np.float32)
    docids = [f"d{i}" for i in range(64)]
    tok = HashTokenizer(100)
    scfg = ServeConfig(topk=5, max_length=6, batch_sizes=(2,))
    eng = DenseEngine(cfg, params, tok, jnp.asarray(corpus), docids, scfg,
                      dtype=jnp.float32)
    got = eng.retrieve_batch(QUERIES[:2])

    from ripor_tpu.data.tokenizer import tokenize_queries
    qi, qm = tokenize_queries(tok, QUERIES[:2], 6)
    reps = model.apply({"params": params}, jnp.asarray(qi), jnp.asarray(qm),
                       method=RiporModel.dense_rep)
    s, i = dense_topk(np.asarray(reps, np.float32), jnp.asarray(corpus), 5)
    for b in range(2):
        assert [d for d, _ in got[b]] == [docids[d] for d in i[b]]
        np.testing.assert_allclose([v for _, v in got[b]], s[b], rtol=1e-5)


def test_http_roundtrip(tiny_engine):
    eng, *_ = tiny_engine
    server = serve_http(eng, port=0, block=False)
    host, port = server.server_address
    try:
        conn = http.client.HTTPConnection(host, port, timeout=120)
        conn.request("GET", "/healthz")
        assert conn.getresponse().read() == b'{"status": "ok"}'
        body = json.dumps({"queries": QUERIES[:2]})
        conn.request("POST", "/retrieve", body=body,
                     headers={"Content-Type": "application/json"})
        resp = json.loads(conn.getresponse().read())
        want = eng.retrieve_batch(QUERIES[:2])
        assert [[tuple(x) for x in r] for r in resp["results"]] == want
        conn.request("GET", "/stats")
        stats = json.loads(conn.getresponse().read())
        assert stats["served"] > 0
        conn.request("POST", "/retrieve", body="not json")
        assert conn.getresponse().status == 400
        conn.request("GET", "/nope")
        assert conn.getresponse().status == 404
    finally:
        server.shutdown()
        eng.stop()
