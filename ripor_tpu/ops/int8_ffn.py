"""int8-weight FFN for the decode step (opt-in, RIPOR_FFN_INT8=1).

The decode-step FFN is the largest MXU block in the step budget (~4.6 ms
bf16 at batch 8 x beam 1000 on v5e: [8000, 768] x [768, 3072] x 12 layers).
v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 rate, and the measured
shape-exact microbench (tools/bench_int8_mm.py) shows the FFN pair dropping
0.548 -> 0.420 ms/layer including the dynamic activation quantize — ~23%
off the FFN block.

Scheme: per-output-channel symmetric int8 weights (quantized ONCE per
retrieval call, outside the decode scan — the scan body closes over the
int8 tensors so XLA hoists the quantize), per-row dynamic symmetric int8
activations. The relu output entering `wo` is non-negative, so its int8
row uses only the 0..127 half-range (7 bits) — measured retrieval impact
is gated the same way as the int8/int4 KV cache
(tools/validate_int8_e2e.py: identical retrieved sets + order required
before flipping any default).

Reference analogue: none — the reference (HansiZeng/RIPOR) runs the HF
t5 FFN in fp16/fp32 (modeling/t5_generative_retriever.py:70-512); this is
a TPU-side throughput option on the same math.
"""
from typing import Tuple

import jax
import jax.numpy as jnp

FfnQ = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]


def quantize_ffn(params, n_layers: int) -> FfnQ:
    """Quantize the decoder FFN weights to per-output-channel int8.

    params: the model param dict (top level, containing "decoder").
    Returns stacked (wi_q [L, d, f] int8, wi_s [L, 1, f] f32,
    wo_q [L, f, d] int8, wo_s [L, 1, d] f32) such that
    wi ~= wi_q * wi_s. Only the reference's non-gated (relu) T5 v1.0 FFN
    is supported — gated variants keep the bf16 path.
    """
    wis, wos = [], []
    for l in range(n_layers):
        ffn = params["decoder"][f"layer_{l}"]["ffn"]
        if "wi" not in ffn:
            raise ValueError("int8 FFN supports only the non-gated T5 v1.0 "
                             "FFN (wi/wo); got a gated variant")
        wis.append(ffn["wi"]["kernel"])
        wos.append(ffn["wo"]["kernel"])
    wi = jnp.stack(wis).astype(jnp.float32)    # [L, d, f]
    wo = jnp.stack(wos).astype(jnp.float32)    # [L, f, d]

    def q(w):
        s = jnp.max(jnp.abs(w), axis=1, keepdims=True) / 127.0  # per out-col
        s = jnp.maximum(s, 1e-12)
        return (jnp.round(w / s).astype(jnp.int8), s)

    wi_q, wi_s = q(wi)
    wo_q, wo_s = q(wo)
    return wi_q, wi_s, wo_q, wo_s


def ffn_int8_apply(h, wi_q, wi_s, wo_q, wo_s, out_dtype=None, tp_axis=None):
    """relu FFN with int8 weights + per-row dynamic int8 activations.

    h: [..., d] the ffn_norm output for ONE layer; wi_q [d, f] / wo_q [f, d]
    int8 with f32 scales [1, f] / [1, d]. Returns [..., d] in ``out_dtype``
    (default: h's dtype).

    ``tp_axis``: megatron row-parallel composition — wi column-sharded /
    wo row-sharded over the axis, h replicated; the wo partial products
    psum in f32 BEFORE the output cast (mirrors FeedForward's bf16 TP path,
    models/layers.py:187-188). Per-shard quantization scales (wo_s from the
    local f/mp rows, the hidden activation scale sh from the local columns)
    make each shard a self-contained int8 scheme whose dequantized partials
    sum exactly like the bf16 partials do.
    """
    out_dtype = out_dtype or h.dtype
    shape = h.shape
    x = h.reshape(-1, shape[-1]).astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-12)
    xi = jnp.round(x * (127.0 / sx)).astype(jnp.int8)
    acc = jax.lax.dot_general(xi, wi_q, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    hmid = jnp.maximum(acc.astype(jnp.float32) * (sx / 127.0) * wi_s, 0.0)
    sh = jnp.maximum(jnp.max(hmid, axis=-1, keepdims=True), 1e-12)
    hi = jnp.round(hmid * (127.0 / sh)).astype(jnp.int8)
    acc2 = jax.lax.dot_general(hi, wo_q, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    y = acc2.astype(jnp.float32) * (sh / 127.0) * wo_s
    if tp_axis is not None:
        y = jax.lax.psum(y, tp_axis)
    return y.astype(out_dtype).reshape(shape)
