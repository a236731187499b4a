"""ctypes bindings for the C++ host components (native/ripor_native.cc).

Auto-builds the shared library on first use (make -C native); every entry
point has a pure-numpy fallback so the framework works without a compiler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libripor_native.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


class _TrieOut(ctypes.Structure):
    _fields_ = [
        ("children", ctypes.POINTER(ctypes.c_int32)),
        ("num_internal", ctypes.c_int64),
        ("unique_codes", ctypes.POINTER(ctypes.c_int32)),
        ("num_groups", ctypes.c_int64),
        ("group_offsets", ctypes.POINTER(ctypes.c_int64)),
        ("group_docids", ctypes.POINTER(ctypes.c_int32)),
    ]


def load_native() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.trie_build.restype = ctypes.c_int
    lib.trie_build.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(_TrieOut)]
    lib.eval_metrics.restype = ctypes.c_int
    lib.eval_metrics.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_double)]
    lib.ripor_free.restype = None
    lib.ripor_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def native_available() -> bool:
    return load_native() is not None


def _copy_and_free(lib, ptr, shape, dtype):
    n = int(np.prod(shape))
    ctype = {np.int32: ctypes.c_int32, np.int64: ctypes.c_int64}[dtype]
    arr = np.ctypeslib.as_array(
        ctypes.cast(ptr, ctypes.POINTER(ctype)), (n,)).copy().reshape(shape)
    lib.ripor_free(ptr)
    return arr.astype(dtype)


def trie_build_native(codes: np.ndarray, K: int):
    """C++ trie builder -> same tuple contents as trie/build.py::build_trie.
    Returns None when the native library is unavailable."""
    lib = load_native()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, np.int32)
    N, M = codes.shape
    out = _TrieOut()
    rc = lib.trie_build(
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(N), ctypes.c_int32(M), ctypes.c_int32(K),
        ctypes.byref(out))
    if rc != 0:
        return None
    children = _copy_and_free(lib, out.children,
                              (int(out.num_internal), K), np.int32)
    unique_codes = _copy_and_free(lib, out.unique_codes,
                                  (int(out.num_groups), M), np.int32)
    group_offsets = _copy_and_free(lib, out.group_offsets,
                                   (int(out.num_groups) + 1,), np.int64)
    group_docids = _copy_and_free(lib, out.group_docids, (N,), np.int32)
    return children, unique_codes, group_offsets, group_docids


_METRIC_IDS = {"mrr": 0, "recall": 1, "ndcg_cut": 2}


def eval_metrics_native(run: Dict[str, Dict[str, float]],
                        qrel: Dict[str, Dict[str, int]],
                        metric: str, k: int) -> Optional[float]:
    """C++ trec metrics over run/qrel dicts. None if native unavailable.

    docid strings are encoded as int64 rank keys preserving string order
    (trec tie-breaking is by docid string)."""
    lib = load_native()
    if lib is None:
        return None
    qids = [q for q in run if q in qrel]
    if not qids:
        return 0.0
    all_docids = sorted({d for q in qids for d in run[q]}
                        | {d for q in qids for d in qrel[q]})
    key_of = {d: i for i, d in enumerate(all_docids)}

    run_keys, run_scores, run_off = [], [], [0]
    qrel_keys, qrel_rels, qrel_off = [], [], [0]
    for q in qids:
        for d, s in run[q].items():
            run_keys.append(key_of[d])
            run_scores.append(s)
        run_off.append(len(run_keys))
        for d, r in qrel[q].items():
            qrel_keys.append(key_of[d])
            qrel_rels.append(r)
        qrel_off.append(len(qrel_keys))

    rk = np.asarray(run_keys, np.int64)
    rsc = np.asarray(run_scores, np.float32)
    ro = np.asarray(run_off, np.int64)
    qk = np.asarray(qrel_keys, np.int64)
    qr = np.asarray(qrel_rels, np.int32)
    qo = np.asarray(qrel_off, np.int64)
    out = np.zeros(len(qids), np.float64)
    rc = lib.eval_metrics(
        rk.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        rsc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ro.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        qk.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        qr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        qo.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(qids)), ctypes.c_int32(k),
        ctypes.c_int32(_METRIC_IDS[metric]),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if rc != 0:
        return None
    valid = out[out >= 0.0]  # recall marks no-rel queries with -1
    return float(valid.mean()) if len(valid) else 0.0
