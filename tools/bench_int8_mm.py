"""Microbench: is an int8 x int8 -> int32 dot 2x bf16 on this chip's MXU?

Decides whether an int8-weight FFN decode path is worth building: the
decode-step FFN at batch 8 x beam 1000 is ~0.9 TFLOP (4.6 ms bf16 MXU
floor, the largest single MXU block in the megarow step budget). v5e
datasheet: 197 bf16 TFLOP/s vs 394 int8 TOP/s per chip.

Times the exact decode FFN shapes ([rows, 768] x [768, 3072] and
[rows, 3072] x [3072, 768]) in bf16 and int8 (+ the dynamic activation
quantize the real path would pay), prints ms and effective TFLOP/s.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    import numpy as np

    rows = int(os.environ.get("MM_ROWS", 8000))
    d, f = 768, 3072
    reps = int(os.environ.get("MM_REPS", 20))
    key = jax.random.PRNGKey(0)

    x = jax.random.normal(key, (rows, d), jnp.bfloat16)
    w1 = jax.random.normal(key, (d, f), jnp.bfloat16)
    w2 = jax.random.normal(key, (f, d), jnp.bfloat16)
    w1_i8 = (jax.random.normal(key, (d, f)) * 40).astype(jnp.int8)
    w2_i8 = (jax.random.normal(key, (f, d)) * 40).astype(jnp.int8)

    @jax.jit
    def ffn_bf16(x):
        def body(x, _):
            h = jnp.maximum(x @ w1, 0)
            return (h @ w2).astype(jnp.bfloat16), None
        # scalar result: the host fence must not transfer the [rows, d]
        # output through the ~20 MB/s relay (that would time the relay)
        return jax.lax.scan(body, x, None, length=reps)[0].sum()

    @jax.jit
    def ffn_int8(x):
        # dynamic per-row activation quantize (what the real path pays)
        def body(x, _):
            s = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32)
            xi = jnp.round(x.astype(jnp.float32) / s * 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xi, w1_i8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            h = jnp.maximum(acc.astype(jnp.float32) * (s / (127.0 * 40.0)), 0)
            hs = jnp.max(h, axis=-1, keepdims=True)
            hi = jnp.round(h / hs * 127).astype(jnp.int8)
            acc2 = jax.lax.dot_general(
                hi, w2_i8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = acc2.astype(jnp.float32) * (hs / (127.0 * 40.0))
            return y.astype(jnp.bfloat16), None
        return jax.lax.scan(body, x, None, length=reps)[0].sum()

    @jax.jit
    def ffn_int8_raw(xi):
        # pure int8 dots, no quantize overhead — the MXU ceiling probe
        def body(xi, _):
            acc = jax.lax.dot_general(
                xi, w1_i8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            hi = (acc >> 8).astype(jnp.int8)
            acc2 = jax.lax.dot_general(
                hi, w2_i8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return (acc2 >> 8).astype(jnp.int8), None
        return jax.lax.scan(body, xi, None, length=reps)[0].astype(
            jnp.int32).sum()

    xi8 = (jax.random.normal(key, (rows, d)) * 40).astype(jnp.int8)
    flops = 2 * rows * d * f * 2 * reps  # two matmuls per rep

    for name, fn, arg in [("bf16", ffn_bf16, x),
                          ("int8+quant", ffn_int8, x),
                          ("int8 raw", ffn_int8_raw, xi8)]:
        np.asarray(fn(arg))  # compile + warm
        t0 = time.perf_counter()
        np.asarray(fn(arg))
        dt = time.perf_counter() - t0
        print(f"{name:12s} {dt*1e3/reps:7.3f} ms/rep-pair  "
              f"{flops/dt/1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
