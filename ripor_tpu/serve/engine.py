"""Microbatching retrieval engine: online queries over warm jitted decode.

The reference's retrieval is offline-only: a fixed-batch loop over a query
file per DDP rank (/root/reference/t5_pretrainer/evaluate.py:457-487, batch
size 1 per GPU at beam 1000). Serving online traffic on a TPU adds two
constraints the reference never faced:

* XLA compiles one program per input shape — so the engine pre-compiles a
  small ladder of batch sizes ("warm shapes") and pads every microbatch up
  to the nearest rung. Queries never trigger a compile after warmup.
* Single-chip decode throughput comes from batching (CLAUDE.md: batch 12 is
  2.2x batch 1 at beam 1000), so the engine coalesces concurrent requests
  into one device call: a background batcher thread drains the request
  queue, waits at most ``max_delay_ms`` for co-riders, then decodes.

`retrieve_batch` is the synchronous path (CLI, tests); `submit` returns a
Future and is what the HTTP front end uses — concurrent clients share
device batches automatically.
"""
from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


@dataclass
class ServeConfig:
    """Engine knobs. ``batch_sizes`` is the warm-shape ladder (ascending);
    the largest entry is also the microbatch cap."""
    num_beams: int = 100
    topk: int = 100
    max_length: int = 64
    batch_sizes: Tuple[int, ...] = (1, 4, 8)
    kv_cache_quant: Optional[str] = None
    # int8-weight FFN (ops/int8_ffn.py). None = env RIPOR_FFN_INT8 default.
    # Either way the engine preflights decode.quant_gate: ffn_int8 combos
    # must carry a recorded per-checkpoint validation (ckpt_dir) or the
    # engine refuses to start (VERDICT r2 weak #6).
    ffn_int8: Optional[bool] = None
    # checkpoint dir whose quant_validation.json vouches for the combo
    ckpt_dir: Optional[str] = None
    constrained: bool = True
    max_delay_ms: float = 5.0
    stats_window: int = 10_000          # latency samples kept for percentiles
    # opt-in device tracing via GET /profile. Off by default: the endpoint
    # occupies a handler thread for the capture window and writes to local
    # disk, so it must be an operator decision, not a client capability.
    # Traces always land under profile_dir (client cannot choose the path).
    enable_profile: bool = False
    profile_dir: str = "/tmp/ripor_trace"
    # how long stop() waits for the in-flight device batch before logging
    # that the batcher is wedged (a beam-1000 batch can take tens of seconds)
    stop_join_timeout_s: float = 300.0
    # serve params at the compute dtype ("bfloat16"): decode runs bf16
    # regardless, so f32 checkpoint params only add a hoisted cast copy and
    # 2x parameter HBM (it decides whether t5-3b fits a chip). None keeps
    # the checkpoint dtype (exact-parity audits).
    param_dtype: Optional[str] = "bfloat16"


@dataclass
class _Request:
    text: str
    future: Future
    t_submit: float = field(default_factory=time.monotonic)


class BaseEngine:
    """Warm-shape microbatching over an abstract per-batch device call.

    Subclasses implement the split pair ``_dispatch(texts) -> handle``
    (host prep + ASYNC device dispatch — must not block on device results;
    jax dispatch returns immediately) and ``_finish(handle, n) -> results``
    (device fence + host post-processing). ``_decode`` = dispatch+finish is
    the synchronous path (warmup, retrieve_batch, CLI).

    The async batcher PIPELINES the two: while the device executes batch N,
    the batcher thread collects + tokenizes + dispatches batch N+1 and a
    completion thread fences/expands batch N (VERDICT r2 weak #5 — the
    serial loop cost ~7% e2e, 60.9 vs 65.5 qps device-only). In-flight
    depth is bounded at 2 so queueing latency stays one device batch.

    Measured (tools/bench_serve.py, beam 100 / int4 / 128 clients, one
    v5e): pipelined + load-aware coalescing serves **71.2 qps e2e**
    (p50 1.77 s, p99 2.28 s, 68/69 batches on the full 64 rung) — above
    the 65.5 qps FENCED device-only rate, because dispatch-ahead also
    hides the per-batch fence latency the synchronous path pays. The
    deep config (beam 1000 / 100k docs / int4 / 32 clients) serves
    8.48 qps e2e (p50 4.24 s, 86/87 batches on the full 12 rung) vs
    8.15 qps device-only — same mechanism, same margin.
    """

    def __init__(self, serve_cfg: ServeConfig, warm: bool = True):
        self.scfg = serve_cfg
        self._sizes = tuple(sorted(set(serve_cfg.batch_sizes)))
        if not self._sizes:
            raise ValueError("batch_sizes must be non-empty")
        self._q: "queue.Queue[_Request]" = queue.Queue()
        self._lock = threading.Lock()
        self._lat: List[float] = []          # seconds, submit -> done
        self._batch_hist: Dict[int, int] = {}
        self._served = 0
        self._t_start = time.monotonic()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._completer: Optional[threading.Thread] = None
        # (batch, rung, handle) triples in flight on the device; maxsize
        # bounds dispatch-ahead so a slow device call backpressures the
        # batcher instead of growing an unbounded on-device queue
        self._inflight: "queue.Queue" = queue.Queue(maxsize=2)
        # dispatched-but-unfinished count (the queue above can't serve as
        # this signal: the completer pops an item BEFORE fencing it). The
        # batcher uses it to coalesce past max_delay_ms while the device
        # is busy — dispatching a partial rung then buys nothing and
        # fragments batches (measured: the r3 pipelined batcher at fixed
        # 10 ms windows served 51.7 qps with 38/26/47 batches on the
        # 16/32/64 rungs vs the serial engine's 60.9 all-64)
        self._inflight_n = 0
        if warm:
            self.warmup()

    def _dispatch(self, texts: Sequence[str]) -> object:
        """Host prep + async device dispatch for one warm-shape batch.
        MUST NOT block on device results."""
        raise NotImplementedError

    def _finish(self, handle: object, n: int) -> List[object]:
        """Fence the device results of ``_dispatch`` and post-process;
        returns one result per input row (callers slice to the first
        ``n`` live rows)."""
        raise NotImplementedError

    def _decode(self, texts: Sequence[str]) -> List[object]:
        """Synchronous decode (warmup / retrieve_batch): dispatch+finish."""
        return self._finish(self._dispatch(texts), len(texts))

    # -- synchronous path ---------------------------------------------------

    def warmup(self):
        """Compile every warm shape (one decode per ladder rung)."""
        for b in self._sizes:
            self._decode([""] * b)

    def retrieve_batch(self, texts: Sequence[str]
                       ) -> List[List[Tuple[str, float]]]:
        """Synchronous retrieval: pads to the nearest warm shape (splitting
        into max-size chunks if the request exceeds the ladder)."""
        t0 = time.monotonic()
        cap = self._sizes[-1]
        out: List[List[Tuple[str, float]]] = []
        for s in range(0, len(texts), cap):
            part = list(texts[s:s + cap])
            rung = next(b for b in self._sizes if b >= len(part))
            res = self._decode(part + [""] * (rung - len(part)))
            out.extend(res[:len(part)])
            self._record(rung, len(part), t0)
        return out

    # -- async microbatching path -------------------------------------------

    def start(self):
        """Start the batcher + completion threads (idempotent; restartable
        after stop())."""
        if self._thread is None or not self._thread.is_alive():
            self._stop.clear()
            # fresh in-flight queue: after a clean stop it holds at most a
            # stale None sentinel (e.g. from a double stop()), which would
            # kill the new completer instantly
            self._inflight = queue.Queue(maxsize=2)
            self._inflight_n = 0
            self._thread = threading.Thread(target=self._batch_loop,
                                            name="ripor-batcher", daemon=True)
            self._completer = threading.Thread(target=self._complete_loop,
                                               name="ripor-completer",
                                               daemon=True)
            self._thread.start()
            self._completer.start()

    def stop(self):
        """Stop the batcher and FAIL any still-queued requests (a future
        that never resolves deadlocks its client; production shutdown must
        drain deterministically). Waits for the batcher to exit, then for
        the completion thread to drain every in-flight device batch, before
        draining the queue — draining earlier would race them (requests
        could be served after stop() returns)."""
        self._stop.set()
        timeout = self.scfg.stop_join_timeout_s
        wedged = False
        if self._thread is not None:
            self._thread.join(timeout=timeout)
            wedged = self._thread.is_alive()
        if (self._completer is not None and self._completer.is_alive()
                and not wedged):
            # batcher exited -> no new dispatches; sentinel unblocks the
            # completer after it finishes the in-flight batches
            self._inflight.put(None)
            self._completer.join(timeout=timeout)
            wedged = self._completer.is_alive()
        if wedged:
            import logging
            logging.getLogger(__name__).error(
                "batcher/completer did not exit within %.0fs; a device call "
                "is likely wedged — queued requests will be failed but "
                "in-flight batches may still complete", timeout)
        while True:
            try:
                req = self._q.get_nowait()
            except queue.Empty:
                break
            if not req.future.done():
                req.future.set_exception(
                    RuntimeError("engine stopped before request was served"))

    def submit(self, text: str) -> Future:
        """Enqueue one query; the Future resolves to its top-k list.
        Requires start(); concurrent submitters share device batches."""
        req = _Request(text, Future())
        self._q.put(req)
        return req.future

    def _batch_loop(self):
        """Collect + tokenize + DISPATCH batches; never blocks on device
        results (the completion thread fences those), so batch N+1's host
        work overlaps batch N's device execution.

        Coalescing is load-aware: ``max_delay_ms`` bounds the ADDED
        latency only while the device is idle. While a batch is in
        flight, collection extends past the window until the rung is full
        — an early partial dispatch couldn't start executing any sooner,
        it would only fragment the ladder (measured on-chip: fixed
        windows fragmented 38/26/47 across the 16/32/64 rungs and cost
        15% e2e qps vs full-rung coalescing)."""
        cap = self._sizes[-1]
        delay = self.scfg.max_delay_ms / 1e3
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.05)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.monotonic() + delay
            while len(batch) < cap:
                left = deadline - time.monotonic()
                if left <= 0 and (self._inflight_n == 0
                                  or self._stop.is_set()):
                    # window closed AND the device is hungry (or we're
                    # stopping): ship what we have
                    break
                # past the window but the device is still busy: a partial
                # dispatch can't start any earlier, so keep coalescing
                # toward a full rung (poll so stop()/completion are seen)
                try:
                    batch.append(self._q.get(
                        timeout=min(max(left, 0.002), 0.05)))
                except queue.Empty:
                    pass
            rung = next(b for b in self._sizes if b >= len(batch))
            try:
                handle = self._dispatch([r.text for r in batch]
                                        + [""] * (rung - len(batch)))
            except Exception as e:      # surface device errors per-request
                for r in batch:
                    r.future.set_exception(e)
                continue
            with self._lock:
                self._inflight_n += 1
            self._inflight.put((batch, rung, handle))

    def _complete_loop(self):
        """Fence + post-process dispatched batches in dispatch order."""
        while True:
            item = self._inflight.get()
            if item is None:            # stop() sentinel after batcher exit
                return
            batch, rung, handle = item
            try:
                res = self._finish(handle, len(batch))
            except Exception as e:
                for r in batch:
                    r.future.set_exception(e)
                with self._lock:
                    self._inflight_n -= 1
                continue
            with self._lock:
                self._inflight_n -= 1
            now = time.monotonic()
            with self._lock:
                self._batch_hist[rung] = self._batch_hist.get(rung, 0) + 1
                self._served += len(batch)
                for r in batch:
                    self._lat.append(now - r.t_submit)
                del self._lat[:-self.scfg.stats_window]
            for r, item_res in zip(batch, res):
                r.future.set_result(item_res)

    # -- observability -------------------------------------------------------

    def _record(self, rung: int, n: int, t0: float):
        now = time.monotonic()
        with self._lock:
            self._batch_hist[rung] = self._batch_hist.get(rung, 0) + 1
            self._served += n
            self._lat.extend([now - t0] * n)
            del self._lat[:-self.scfg.stats_window]

    def stats(self) -> Dict[str, object]:
        """Serving stats: latency percentiles (seconds, over the last
        ``stats_window`` requests), lifetime qps, batch-size histogram."""
        with self._lock:
            lat = sorted(self._lat)
            hist = dict(self._batch_hist)
            served = self._served
        elapsed = max(time.monotonic() - self._t_start, 1e-9)

        def pct(p):
            if not lat:
                return None
            return lat[min(len(lat) - 1, int(p / 100 * len(lat)))]

        return {"served": served, "qps": served / elapsed,
                "p50_s": pct(50), "p90_s": pct(90), "p99_s": pct(99),
                "batch_hist": hist, "queue_depth": self._q.qsize()}


class RetrievalEngine(BaseEngine):
    """Query text -> top-k (docid, score) over the constrained-beam decoder.

    Wraps decode.beam.make_beam_search_fn + trie group expansion (the same
    pair stage_retrieve uses offline) behind warm shapes and a microbatcher.
    """

    def __init__(self, cfg, params, tok, trie, docids: Sequence[str],
                 serve_cfg: ServeConfig = ServeConfig(), warm: bool = True,
                 mesh=None):
        import jax
        import jax.numpy as jnp
        from ripor_tpu.decode.beam import (make_beam_search_fn,
                                           make_sharded_beam_search_fn)
        from ripor_tpu.trie.succinct import succinct_tables

        self.cfg = cfg
        self._tok = tok
        self._trie = trie
        self._docids = list(docids)
        ffn_int8 = serve_cfg.ffn_int8
        if ffn_int8 is None:
            import os
            ffn_int8 = os.environ.get("RIPOR_FFN_INT8", "0") == "1"
        from ripor_tpu.decode.quant_gate import ensure_quant_validated
        ensure_quant_validated(serve_cfg.kv_cache_quant, ffn_int8,
                               ckpt_dir=serve_cfg.ckpt_dir)
        if serve_cfg.param_dtype:
            pd = jnp.dtype(serve_cfg.param_dtype)
            params = jax.tree.map(
                lambda x: x.astype(pd)
                if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
                params)
        self._params = params
        if mesh is not None:
            # pod serving: queries shard over the mesh 'data' axis (DP
            # decode, decode/beam.py::make_sharded_beam_search_fn) — every
            # warm rung must divide it so microbatches shard evenly
            from ripor_tpu.core.mesh import DATA_AXIS
            ndata = mesh.shape[DATA_AXIS]
            bad = [b for b in serve_cfg.batch_sizes if b % ndata != 0]
            if bad:
                raise ValueError(
                    f"batch_sizes {bad} do not divide the mesh 'data' axis "
                    f"({ndata}) — pick rungs that are multiples of it")
            self._fn = make_sharded_beam_search_fn(
                cfg, serve_cfg.num_beams, mesh,
                constrained=serve_cfg.constrained,
                kv_cache_quant=serve_cfg.kv_cache_quant,
                ffn_int8=ffn_int8)
        else:
            self._fn = make_beam_search_fn(
                cfg, serve_cfg.num_beams, constrained=serve_cfg.constrained,
                kv_cache_quant=serve_cfg.kv_cache_quant,
                ffn_int8=ffn_int8)
        self._tables = jax.tree.map(jnp.asarray, succinct_tables(trie))
        self._jnp = jnp
        super().__init__(serve_cfg, warm=warm)

    def _dispatch(self, texts: Sequence[str]):
        """Tokenize + launch ONE device decode; returns the un-fenced
        device arrays (jax dispatch is async — the call returns before the
        device finishes, which is what lets the batcher pipeline)."""
        from ripor_tpu.data.tokenizer import tokenize_queries

        jnp = self._jnp
        ids, mask = tokenize_queries(self._tok, list(texts),
                                     self.scfg.max_length)
        scores, codes, state = self._fn(self._params, jnp.asarray(ids),
                                        jnp.asarray(mask), self._tables)
        return scores, state

    def _finish(self, handle, n: int):
        """Fence (np.asarray — the only fence that works through the axon
        relay) + trie group expansion per live query."""
        from ripor_tpu.decode import expand_groups_to_docids

        scores, state = handle
        scores = np.asarray(scores)
        state = np.asarray(state)
        groups = np.where(state <= -2, -2 - state, -1)
        out = []
        for bi in range(n):
            docs, doc_scores = expand_groups_to_docids(
                self._trie, groups[bi], scores[bi], self.scfg.topk)
            out.append([(self._docids[d], float(v))
                        for d, v in zip(docs, doc_scores)])
        return out


class DenseEngine(BaseEngine):
    """Query text -> top-k (docid, score) by exact/approx MIPS over a
    device-resident corpus (evaluation/retriever.py::dense_topk — the
    single-chip replacement for the reference's 8-GPU faiss shard,
    tasks/evaluator.py:694-831). ``corpus``: [N, d] float array (uploaded
    once via retriever.device_corpus, bf16 fits 8.8M x 768 on one chip)."""

    def __init__(self, cfg, params, tok, corpus, docids: Sequence[str],
                 serve_cfg: ServeConfig = ServeConfig(), warm: bool = True,
                 approx: bool = False, dtype=None):
        import jax
        import jax.numpy as jnp
        from ripor_tpu.evaluation.retriever import Int8Corpus, device_corpus
        from ripor_tpu.models import RiporModel

        self.cfg = cfg
        self._tok = tok
        self._docids = list(docids)
        self._params = params
        self._approx = approx
        self._corpus = (corpus
                        if isinstance(corpus, (jax.Array, Int8Corpus))
                        else device_corpus(corpus))
        model = RiporModel(cfg, dtype=dtype or jnp.bfloat16)
        self._rep = jax.jit(lambda p, i, m: model.apply(
            {"params": p}, i, m, method=RiporModel.dense_rep))
        self._jnp = jnp
        super().__init__(serve_cfg, warm=warm)

    def _dispatch(self, texts: Sequence[str]):
        """Tokenize + launch the query encoder (async)."""
        from ripor_tpu.data.tokenizer import tokenize_queries

        jnp = self._jnp
        ids, mask = tokenize_queries(self._tok, list(texts),
                                     self.scfg.max_length)
        return self._rep(self._params, jnp.asarray(ids), jnp.asarray(mask))

    def _finish(self, reps, n: int):
        from ripor_tpu.evaluation.retriever import dense_topk

        scores, idx = dense_topk(np.asarray(reps, np.float32), self._corpus,
                                 self.scfg.topk, approx=self._approx)
        return [[(self._docids[d], float(v)) for d, v in zip(qi, qs)]
                for qi, qs in zip(idx[:n], scores[:n])]
