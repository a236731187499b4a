"""Pallas beam-gather kernels (ops/beam_gather.py), interpret mode —
semantics vs numpy take_along_axis (the XLA fallback in decode/beam.py)."""
import jax.numpy as jnp
import numpy as np

from ripor_tpu.ops.beam_gather import beam_gather_blocks, beam_gather_rows


def test_beam_gather_rows_matches_numpy(np_rng):
    G, N, F = 3, 80, 384
    cache = jnp.asarray(np_rng.normal(size=(G, N, F)), jnp.float32)
    src = jnp.asarray(np_rng.integers(0, N, (G, N)), jnp.int32)
    out = beam_gather_rows(cache, src, interpret=True)
    ref = np.take_along_axis(np.asarray(cache),
                             np.asarray(src)[:, :, None], axis=1)
    np.testing.assert_allclose(np.asarray(out), ref)


def test_beam_gather_rows_pads_ragged(np_rng):
    # N not a multiple of the DMA chunk, F not a multiple of 128
    G, N, F = 2, 37, 100
    cache = jnp.asarray(np_rng.normal(size=(G, N, F)), jnp.float32)
    src = jnp.asarray(np_rng.integers(0, N, (G, N)), jnp.int32)
    out = beam_gather_rows(cache, src, interpret=True)
    ref = np.take_along_axis(np.asarray(cache),
                             np.asarray(src)[:, :, None], axis=1)
    np.testing.assert_allclose(np.asarray(out), ref)


def test_beam_gather_blocks_matches_numpy(np_rng):
    # the layout-free [G, N, R, C] variant used for the [Mc, H*D] KV cache
    G, N, R, C = 3, 80, 8, 256
    cache = jnp.asarray(np_rng.normal(size=(G, N, R, C)), jnp.float32)
    src = jnp.asarray(np_rng.integers(0, N, (G, N)), jnp.int32)
    out = beam_gather_blocks(cache, src, interpret=True)
    ref = np.take_along_axis(np.asarray(cache),
                             np.asarray(src)[:, :, None, None], axis=1)
    np.testing.assert_allclose(np.asarray(out), ref)


def test_beam_gather_blocks_ragged_beams(np_rng):
    G, N, R, C = 2, 53, 4, 128
    cache = jnp.asarray(np_rng.normal(size=(G, N, R, C)), jnp.float32)
    src = jnp.asarray(np_rng.integers(0, N, (G, N)), jnp.int32)
    out = beam_gather_blocks(cache, src, interpret=True)
    ref = np.take_along_axis(np.asarray(cache),
                             np.asarray(src)[:, :, None, None], axis=1)
    np.testing.assert_allclose(np.asarray(out), ref)


def test_step_attention_matches_xla(np_rng):
    """Pallas one-position cached attention == the XLA reduce-fusion
    formulation (models/t5.py::_step_self_attention), interpret mode."""
    import jax.numpy as jnp
    from ripor_tpu.models.t5 import _step_self_attention
    from ripor_tpu.ops.step_attention import step_attention

    B, N, Mc, H, D = 2, 24, 16, 4, 8
    F = H * D
    q = jnp.asarray(np_rng.normal(size=(B, N, H, D)), jnp.float32)
    ck = jnp.asarray(np_rng.normal(size=(B, N, Mc, H, D)), jnp.float32)
    cv = jnp.asarray(np_rng.normal(size=(B, N, Mc, H, D)), jnp.float32)
    bias = jnp.asarray(np_rng.normal(size=(H, Mc)), jnp.float32)
    ref = _step_self_attention(q, ck, cv, bias, jnp.float32)
    out = step_attention(q.reshape(B, N, F), ck.reshape(B, N, Mc, F),
                         cv.reshape(B, N, Mc, F), bias.T, H, interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref).reshape(B, N, F),
                               rtol=2e-5, atol=2e-5)


def test_step_attention_ragged_beams(np_rng):
    import jax.numpy as jnp
    from ripor_tpu.models.t5 import _step_self_attention
    from ripor_tpu.ops.step_attention import step_attention

    B, N, Mc, H, D = 1, 13, 8, 2, 4   # N not a multiple of the chunk
    F = H * D
    q = jnp.asarray(np_rng.normal(size=(B, N, H, D)), jnp.float32)
    ck = jnp.asarray(np_rng.normal(size=(B, N, Mc, H, D)), jnp.float32)
    cv = jnp.asarray(np_rng.normal(size=(B, N, Mc, H, D)), jnp.float32)
    bias = jnp.asarray(np_rng.normal(size=(H, Mc)), jnp.float32)
    ref = _step_self_attention(q, ck, cv, bias, jnp.float32)
    out = step_attention(q.reshape(B, N, F), ck.reshape(B, N, Mc, F),
                         cv.reshape(B, N, Mc, F), bias.T, H, interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref).reshape(B, N, F),
                               rtol=2e-5, atol=2e-5)
