"""Stdlib HTTP front end for RetrievalEngine (no extra dependencies).

Endpoints:
  POST /retrieve   {"queries": ["...", ...]}
                   -> {"results": [[[docid, score], ...], ...]}
  GET  /stats      engine.stats() JSON
  GET  /healthz    200 "ok"

Each query is submitted to the engine's microbatcher individually, so
concurrent HTTP clients (the server is threading) share device batches.
The reference has no serving path at all — its closest analogue is the
offline run.json writer (/root/reference/t5_pretrainer/evaluate.py:489-526).
"""
from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from ripor_tpu.serve.engine import RetrievalEngine

# only one device trace may run at a time (jax.profiler.start_trace raises
# on concurrent starts; two handler threads must not race it)
_PROFILE_LOCK = threading.Lock()


def _make_handler(engine: RetrievalEngine):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):   # quiet; engine.stats() observes
            pass

        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok"})
            elif self.path == "/stats":
                self._json(200, engine.stats())
            elif self.path.startswith("/profile"):
                # capture a device trace while live traffic runs (view with
                # tensorboard / xprof): /profile?ms=2000. Opt-in only
                # (ServeConfig.enable_profile) and the output dir is pinned
                # server-side: a client-supplied path would let any caller
                # write to arbitrary directories, and the default-off gate
                # keeps a 0.0.0.0 bind from exposing a thread-blocking,
                # disk-writing endpoint to the network.
                if not engine.scfg.enable_profile:
                    self._json(403, {"error": "profiling disabled "
                                     "(ServeConfig.enable_profile)"})
                    return
                from urllib.parse import parse_qs, urlparse
                import time as _t
                q = parse_qs(urlparse(self.path).query)
                try:
                    ms = min(float(q.get("ms", ["1000"])[0]), 30_000)
                except ValueError:
                    ms = float("nan")
                if not ms > 0:        # rejects <=0 AND NaN
                    self._json(400, {"error": "bad ms parameter"})
                    return
                out = engine.scfg.profile_dir
                import jax
                if not _PROFILE_LOCK.acquire(blocking=False):
                    self._json(409, {"error": "a trace is already running"})
                    return
                started = False
                try:
                    jax.profiler.start_trace(out)
                    started = True
                    _t.sleep(ms / 1e3)
                    jax.profiler.stop_trace()
                    started = False
                except Exception as e:
                    if started:     # never leak a running trace: a wedged
                        try:        # profiler poisons every later /profile
                            jax.profiler.stop_trace()
                        except Exception:
                            pass
                    self._json(500, {"error": f"trace failed: {e}"})
                    return
                finally:
                    _PROFILE_LOCK.release()
                self._json(200, {"trace_dir": out, "captured_ms": ms})
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/retrieve":
                self._json(404, {"error": f"unknown path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                queries = req["queries"]
                assert isinstance(queries, list) and all(
                    isinstance(q, str) for q in queries)
            except Exception as e:
                self._json(400, {"error": f"bad request: {e}"})
                return
            futures = [engine.submit(q) for q in queries]
            try:
                results = [f.result(timeout=300) for f in futures]
            except Exception as e:
                self._json(500, {"error": str(e)})
                return
            self._json(200, {"results": results})

    return Handler


def serve_http(engine: RetrievalEngine, host: str = "127.0.0.1",
               port: int = 8600, block: bool = True) -> ThreadingHTTPServer:
    """Start the engine's batcher + an HTTP server. With block=False the
    server runs on a daemon thread (port via server.server_address[1] —
    pass port=0 for an ephemeral one) and the caller owns shutdown:
    server.shutdown(); engine.stop()."""
    import threading

    engine.start()
    server = ThreadingHTTPServer((host, port), _make_handler(engine))
    if block:
        try:
            server.serve_forever()
        finally:
            engine.stop()
    else:
        threading.Thread(target=server.serve_forever, daemon=True).start()
    return server
