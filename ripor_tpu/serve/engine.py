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
    """Warm-shape microbatching over an abstract per-batch ``_decode``.

    Subclasses implement ``_decode(texts) -> list[result]`` as ONE device
    call at a warm shape; this base provides the shape ladder, the
    synchronous split/pad path, the batcher thread, and serving stats.
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
        if warm:
            self.warmup()

    def _decode(self, texts: Sequence[str]) -> List[object]:
        raise NotImplementedError

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
        """Start the batcher thread (idempotent)."""
        if self._thread is None or not self._thread.is_alive():
            self._stop.clear()
            self._thread = threading.Thread(target=self._batch_loop,
                                            name="ripor-batcher", daemon=True)
            self._thread.start()

    def stop(self):
        """Stop the batcher and FAIL any still-queued requests (a future
        that never resolves deadlocks its client; production shutdown must
        drain deterministically). Waits for the in-flight device batch to
        finish before draining the queue — draining while the batcher still
        runs would race it (requests could be served after stop() returns)."""
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=self.scfg.stop_join_timeout_s)
            if self._thread.is_alive():
                import logging
                logging.getLogger(__name__).error(
                    "batcher did not exit within %.0fs; a device call is "
                    "likely wedged — queued requests will be failed but the "
                    "in-flight batch may still complete",
                    self.scfg.stop_join_timeout_s)
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
                if left <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=left))
                except queue.Empty:
                    break
            rung = next(b for b in self._sizes if b >= len(batch))
            t0 = min(r.t_submit for r in batch)
            try:
                res = self._decode([r.text for r in batch]
                                   + [""] * (rung - len(batch)))
            except Exception as e:      # surface device errors per-request
                for r in batch:
                    r.future.set_exception(e)
                continue
            now = time.monotonic()
            with self._lock:
                self._batch_hist[rung] = self._batch_hist.get(rung, 0) + 1
                self._served += len(batch)
                for r in batch:
                    self._lat.append(now - r.t_submit)
                del self._lat[:-self.scfg.stats_window]
            for r, item in zip(batch, res):
                r.future.set_result(item)

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
                kv_cache_quant=serve_cfg.kv_cache_quant)
        else:
            self._fn = make_beam_search_fn(
                cfg, serve_cfg.num_beams, constrained=serve_cfg.constrained,
                kv_cache_quant=serve_cfg.kv_cache_quant)
        self._tables = jax.tree.map(jnp.asarray, succinct_tables(trie))
        self._jnp = jnp
        super().__init__(serve_cfg, warm=warm)

    def _decode(self, texts: Sequence[str]):
        """One device call at a warm shape; returns per-query top-k lists."""
        from ripor_tpu.data.tokenizer import tokenize_queries
        from ripor_tpu.decode import expand_groups_to_docids

        jnp = self._jnp
        ids, mask = tokenize_queries(self._tok, list(texts),
                                     self.scfg.max_length)
        scores, codes, state = self._fn(self._params, jnp.asarray(ids),
                                        jnp.asarray(mask), self._tables)
        scores = np.asarray(scores)
        state = np.asarray(state)
        groups = np.where(state <= -2, -2 - state, -1)
        out = []
        for bi in range(len(texts)):
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

    def _decode(self, texts: Sequence[str]):
        from ripor_tpu.data.tokenizer import tokenize_queries
        from ripor_tpu.evaluation.retriever import dense_topk

        jnp = self._jnp
        ids, mask = tokenize_queries(self._tok, list(texts),
                                     self.scfg.max_length)
        reps = self._rep(self._params, jnp.asarray(ids), jnp.asarray(mask))
        scores, idx = dense_topk(np.asarray(reps, np.float32), self._corpus,
                                 self.scfg.topk, approx=self._approx)
        return [[(self._docids[d], float(v)) for d, v in zip(qi, qs)]
                for qi, qs in zip(idx, scores)]
