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


# ---- pipelined batcher overlap semantics (VERDICT r3 #3) -------------------
# A fake engine with recorded dispatch/finish timestamps pins the threaded
# batcher's contract: dispatch-ahead (batch N+1 dispatches before batch N
# finishes), bounded in-flight depth (backpressure), dispatch-order
# completion, and clean restart after stop().

import time as _time

from ripor_tpu.serve.engine import BaseEngine


class _FakeEngine(BaseEngine):
    """_dispatch returns instantly (async-dispatch contract); _finish
    blocks for ``device_s`` (the device fence), so pipelining shows up as
    dispatch(N+1) happening while finish(N) is still blocked."""

    def __init__(self, device_s=0.1, sizes=(1, 2, 4), delay_ms=2.0):
        self.events = []                    # (kind, batch_id, t_monotonic)
        self._device_s = device_s
        self._next = 0
        self._ev_lock = threading.Lock()
        super().__init__(ServeConfig(batch_sizes=sizes,
                                     max_delay_ms=delay_ms), warm=False)

    def _dispatch(self, texts):
        with self._ev_lock:
            bid = self._next
            self._next += 1
            self.events.append(("dispatch", bid, _time.monotonic()))
        return bid, list(texts)

    def _finish(self, handle, n):
        bid, texts = handle
        _time.sleep(self._device_s)
        with self._ev_lock:
            self.events.append(("finish", bid, _time.monotonic()))
        return [f"b{bid}_r{i}" for i in range(len(texts))]


def test_batcher_overlaps_dispatch_with_device():
    eng = _FakeEngine(device_s=0.15, sizes=(1,))
    eng.start()
    try:
        futs = [eng.submit(f"q{i}") for i in range(6)]
        [f.result(timeout=30) for f in futs]
    finally:
        eng.stop()
    disp = {b: t for k, b, t in eng.events if k == "dispatch"}
    fin = {b: t for k, b, t in eng.events if k == "finish"}
    # pipelining: some batch N+1 dispatched BEFORE batch N finished
    overlapped = [b for b in disp if b + 1 in disp and b in fin
                  and disp[b + 1] < fin[b]]
    assert overlapped, f"no dispatch-ahead observed: {eng.events}"


def test_batcher_backpressure_bounds_inflight():
    # 20 instant 1-query batches against a slow device: without the
    # bounded in-flight queue the batcher would dispatch all 20 ahead.
    # The structural bound is maxsize(2) + 1 popped by the completer + 1
    # dispatched-but-blocked-on-put = 4.
    eng = _FakeEngine(device_s=0.05, sizes=(1,))
    eng.start()
    try:
        futs = [eng.submit(f"q{i}") for i in range(20)]
        [f.result(timeout=60) for f in futs]
    finally:
        eng.stop()
    events = sorted(eng.events, key=lambda e: e[2])
    depth = max_depth = 0
    for kind, _, _ in events:
        depth += 1 if kind == "dispatch" else -1
        max_depth = max(max_depth, depth)
    assert max_depth <= 4, f"dispatch-ahead depth {max_depth} > 4"
    assert max_depth >= 2, "no overlap at all — pipeline is serialized"


def test_batcher_coalesces_past_window_while_device_busy():
    """Load-aware coalescing: requests that trickle in AFTER max_delay_ms
    must still merge into one full rung while a batch is in flight —
    dispatching partial rungs early fragments the ladder without starting
    any sooner (measured on-chip: 51.7 vs 60.9 qps)."""
    eng = _FakeEngine(device_s=0.3, sizes=(1, 2, 4), delay_ms=1.0)
    eng.start()
    try:
        f0 = eng.submit("warm")          # dispatches alone, holds the device
        _time.sleep(0.05)
        futs = []
        for i in range(4):               # each arrives past the 1 ms window
            futs.append(eng.submit(f"q{i}"))
            _time.sleep(0.02)
        [f.result(timeout=30) for f in [f0] + futs]
    finally:
        eng.stop()
    # the four trickled requests coalesced into ONE full rung-4 batch
    assert eng.stats()["batch_hist"].get(4, 0) >= 1, eng.stats()
    disp = {b: t for k, b, t in eng.events if k == "dispatch"}
    fin = {b: t for k, b, t in eng.events if k == "finish"}
    # and it still dispatched AHEAD of the in-flight batch finishing
    assert disp[1] < fin[0], eng.events


def test_batcher_completes_in_dispatch_order():
    eng = _FakeEngine(device_s=0.02, sizes=(1,))
    eng.start()
    try:
        futs = [eng.submit(f"q{i}") for i in range(10)]
        res = [f.result(timeout=30) for f in futs]
    finally:
        eng.stop()
    fin_order = [b for k, b, _ in sorted(eng.events, key=lambda e: e[2])
                 if k == "finish"]
    assert fin_order == sorted(fin_order), f"out-of-order: {fin_order}"
    # each query's result came from a batch dispatched in submit order
    assert [int(r.split("_")[0][1:]) for r in res] == sorted(
        int(r.split("_")[0][1:]) for r in res)


def test_batcher_restarts_after_stop():
    eng = _FakeEngine(device_s=0.01)
    eng.start()
    assert eng.submit("a").result(timeout=10) is not None
    eng.stop()
    eng.stop()      # double stop may leave a stale sentinel in _inflight
    eng.start()     # must not inherit it (fresh in-flight queue)
    assert eng.submit("b").result(timeout=10)[0].startswith("b")
    eng.stop()
