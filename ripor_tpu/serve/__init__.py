"""Online serving for ripor_tpu retrieval.

The reference ships only offline batch retrieval (one DDP process per GPU
writing run.json, /root/reference/t5_pretrainer/evaluate.py:457-526); this
package turns the same decode path into a production service: a warm-shape
microbatching engine (`RetrievalEngine`) and a stdlib HTTP front end
(`serve_http`).
"""
from ripor_tpu.serve.engine import DenseEngine, RetrievalEngine, ServeConfig
from ripor_tpu.serve.http import serve_http

__all__ = ["DenseEngine", "RetrievalEngine", "ServeConfig", "serve_http"]
