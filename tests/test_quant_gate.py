"""decode.quant_gate: ffn_int8 combos must carry a recorded per-checkpoint
validation before serving/retrieval honors them (VERDICT r2 weak #6)."""
import json

import pytest

from ripor_tpu.decode.quant_gate import (VALIDATION_FILE,
                                         ensure_quant_validated,
                                         quant_combo_key,
                                         record_quant_validation)


def test_combo_keys():
    assert quant_combo_key(None, False) == "exact"
    assert quant_combo_key("int8", False) == "int8kv"
    assert quant_combo_key(None, True) == "ffn_int8"
    assert quant_combo_key("int4", True) == "ffn_int8+int4kv"


def test_kv_only_passes_without_record(tmp_path):
    # library-validated transparent (48/48, tools/validate_int8_e2e.py)
    ensure_quant_validated("int8", False, ckpt_dir=None)
    ensure_quant_validated("int4", False, ckpt_dir=str(tmp_path))


def test_ffn_int8_refuses_unvalidated(tmp_path, monkeypatch):
    monkeypatch.delenv("RIPOR_UNVALIDATED_QUANT_OK", raising=False)
    with pytest.raises(ValueError, match="no recorded validation"):
        ensure_quant_validated(None, True, ckpt_dir=str(tmp_path))
    with pytest.raises(ValueError, match="no checkpoint directory"):
        ensure_quant_validated("int4", True, ckpt_dir=None)


def test_record_then_accept(tmp_path):
    v = record_quant_validation(str(tmp_path), "ffn_int8", n_queries=48,
                                set_identical=47, order_identical=46,
                                metrics_identical=True)
    assert v["accepted"]          # 46/48 >= 0.9
    ensure_quant_validated(None, True, ckpt_dir=str(tmp_path))
    # the file merges combos
    v2 = record_quant_validation(str(tmp_path), "ffn_int8+int4kv",
                                 n_queries=48, set_identical=35,
                                 order_identical=27, metrics_identical=True)
    assert not v2["accepted"]     # 27/48 < 0.9 — measured compounding
    data = json.loads((tmp_path / VALIDATION_FILE).read_text())
    assert set(data) == {"ffn_int8", "ffn_int8+int4kv"}
    with pytest.raises(ValueError, match="NOT accepted"):
        ensure_quant_validated("int4", True, ckpt_dir=str(tmp_path))


def test_operator_override_env(tmp_path, monkeypatch):
    monkeypatch.setenv("RIPOR_UNVALIDATED_QUANT_OK", "1")
    # loud log instead of refusal
    ensure_quant_validated("int4", True, ckpt_dir=str(tmp_path))


def test_operator_forced_accept(tmp_path):
    v = record_quant_validation(str(tmp_path), "ffn_int8+int4kv",
                                n_queries=48, set_identical=35,
                                order_identical=27, metrics_identical=True,
                                accepted=True)
    assert v["accepted"]
    ensure_quant_validated("int4", True, ckpt_dir=str(tmp_path))


def test_serve_engine_preflights(tmp_path, monkeypatch):
    """RetrievalEngine refuses to construct with an unvalidated ffn_int8
    combo — the env flag alone can no longer flip serving numerics."""
    import numpy as np

    from ripor_tpu.models import ripor_small
    from ripor_tpu.serve.engine import RetrievalEngine, ServeConfig
    from ripor_tpu.trie import build_trie

    monkeypatch.delenv("RIPOR_UNVALIDATED_QUANT_OK", raising=False)
    cfg = ripor_small(M=4, K=8)
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 8, (20, 4))
    trie = build_trie(codes, 8)
    scfg = ServeConfig(num_beams=4, topk=5, batch_sizes=(2,),
                       kv_cache_quant="int4", ffn_int8=True,
                       ckpt_dir=str(tmp_path))
    with pytest.raises(ValueError, match="quant preflight"):
        RetrievalEngine(cfg, {}, None, trie,
                        [f"d{i}" for i in range(20)], scfg, warm=False)
    # same via the env default resolution
    monkeypatch.setenv("RIPOR_FFN_INT8", "1")
    scfg2 = ServeConfig(num_beams=4, topk=5, batch_sizes=(2,),
                        kv_cache_quant="int4", ckpt_dir=str(tmp_path))
    with pytest.raises(ValueError, match="quant preflight"):
        RetrievalEngine(cfg, {}, None, trie,
                        [f"d{i}" for i in range(20)], scfg2, warm=False)
