"""Mixed-precision policy: bf16 compute / fp32 params & optimizer state.

The reference flips HF's ``bf16`` flag (t5_pretrainer/main.py:152). Here the
policy is explicit and threaded through the model: parameters live in fp32,
activations/matmuls run in bf16 on the MXU, losses and logits accumulate fp32.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_to_output(self, x):
        return jnp.asarray(x, self.output_dtype)


DEFAULT_POLICY = Policy()
FP32_POLICY = Policy(compute_dtype=jnp.float32)
