"""Trainer auto-resume + the 16x1024 DocID geometry variant."""
import jax
import jax.numpy as jnp
import numpy as np

from ripor_tpu.models import RiporConfig, RiporModel, T5Config, ripor_small
from ripor_tpu.train import TrainConfig, Trainer


def _setup(M=4, K=8, B=4):
    cfg = ripor_small(M=M, K=K)
    model = RiporModel(cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 100, (B, 6)), jnp.int32)
    mask = jnp.ones_like(ids)
    codes = jnp.asarray(rng.integers(0, K, (B, M)), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids, mask, codes)["params"]
    return cfg, model, params, {"query_ids": ids, "query_mask": mask, "codes": codes}


def test_trainer_resume(tmp_path):
    cfg, model, params, batch = _setup()
    tcfg = TrainConfig(loss_type="t5seq_aq_encoder_seq2seq", learning_rate=1e-3)
    batches = [batch] * 6

    # uninterrupted run
    t_full = Trainer(model, tcfg, params)
    full_state, _ = t_full.run(iter(batches), jax.random.PRNGKey(7))

    # interrupted after 3 steps, then resumed
    ck = tmp_path / "ck"
    t1 = Trainer(model, tcfg, params, checkpoint_dir=ck, save_steps=3)
    t1.run(iter(batches[:3]), jax.random.PRNGKey(7))
    t2 = Trainer(model, tcfg, params, checkpoint_dir=ck, save_steps=3)
    assert int(t2.state.step) == 3  # restored
    resumed_state, _ = t2.run(iter(batches), jax.random.PRNGKey(7))

    assert int(resumed_state.step) == int(full_state.step) == 6
    for a, b in zip(jax.tree.leaves(full_state.params),
                    jax.tree.leaves(resumed_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_16x1024_variant():
    """The full_16_1024_scripts geometry: M=16, K=1024 (10-bit codes).
    Stresses the mask-table width (BASELINE config #4)."""
    from ripor_tpu.decode import beam_search
    from ripor_tpu.trie import build_trie

    cfg = RiporConfig(
        t5=T5Config(vocab_size=256, d_model=64, d_kv=16, d_ff=128,
                    num_layers=2, num_decoder_layers=2, num_heads=4,
                    dropout_rate=0.0),
        M=16, K=1024)
    model = RiporModel(cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 256, (2, 8)), jnp.int32)
    mask = jnp.ones_like(ids)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids, mask,
                        jnp.zeros((2, 16), jnp.int32))["params"]
    assert params["codebooks"].shape == (16, 1024, 64)

    codes = rng.integers(0, 1024, (500, 16))
    trie = build_trie(codes, 1024)
    out = beam_search(cfg, params, np.asarray(ids), np.asarray(mask),
                      trie=trie, num_beams=8, dtype=jnp.float32)
    valid = {tuple(r) for r in trie.unique_codes.tolist()}
    assert all(tuple(out.codes[b, 0].tolist()) in valid for b in range(2))
    assert out.codes.shape == (2, 8, 16)


def test_rankdata_to_docid_groups():
    from ripor_tpu.pipeline.datagen import rankdata_to_docid_groups
    rd = {"q": {"1_2": [["d3", 9.0], ["d1", 5.0]]}}
    assert rankdata_to_docid_groups(rd) == {"q": {"1_2": ["d3", "d1"]}}
