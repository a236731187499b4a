"""Legacy losses/regularizers + multi-id embeds + AQ flat search."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ripor_tpu.train.regularizers import (
    RegWeightScheduler,
    flops_reg,
    l0_stat,
    l1_reg,
    ranknet_loss,
    sparsity_ratio,
)


def test_reg_weight_scheduler():
    s = RegWeightScheduler(lambda_=2.0, T=10)
    assert float(s(0)) == 0.0
    assert float(s(5)) == pytest.approx(2.0 * 0.25)
    assert float(s(10)) == pytest.approx(2.0)
    assert float(s(50)) == pytest.approx(2.0)  # capped


def test_regs():
    x = jnp.asarray([[1.0, 0.0, -2.0], [3.0, 0.0, 0.0]])
    assert float(flops_reg(x)) == pytest.approx(4.0 + 0.0 + 1.0)
    assert float(l1_reg(x)) == pytest.approx((3 + 3) / 2)
    assert float(l0_stat(x)) == pytest.approx(1.5)
    assert float(sparsity_ratio(x)) == pytest.approx(0.5)


def test_ranknet():
    loss_good = ranknet_loss(jnp.asarray([5.0]), jnp.asarray([0.0]))
    loss_bad = ranknet_loss(jnp.asarray([0.0]), jnp.asarray([5.0]))
    assert float(loss_good) < 0.01 < float(loss_bad)


def test_ranknet_loss_fn_registered():
    from ripor_tpu.models import RiporModel, ripor_small
    from ripor_tpu.train.losses import LOSS_FNS
    cfg = ripor_small(M=4, K=8)
    model = RiporModel(cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 100, (4, 6)), jnp.int32)
    codes = jnp.asarray(rng.integers(0, 8, (4, 4)), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids, ids, codes)["params"]
    out = LOSS_FNS["t5seq_aq_encoder_ranknet"](
        model, params,
        {"query_ids": ids, "query_mask": jnp.ones_like(ids),
         "pos_codes": codes,
         "neg_codes": jnp.asarray(rng.integers(0, 8, (4, 4)), jnp.int32)})
    assert np.isfinite(float(out["rank"]))


def test_multi_id_embeds_mean():
    from ripor_tpu.models import RiporModel, ripor_small
    cfg = ripor_small(M=4, K=8)
    model = RiporModel(cfg)
    ids = jnp.ones((2, 4), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids, ids,
                        jnp.zeros((2, 4), jnp.int32))["params"]
    codes = jnp.asarray(np.random.default_rng(0).integers(0, 8, (2, 4, 3)), jnp.int32)
    multi = model.apply({"params": params}, codes,
                        method=RiporModel.decoder_inputs_from_multi_codes)
    single = [model.apply({"params": params}, codes[:, :, g],
                          method=RiporModel.decoder_inputs_from_codes)
              for g in range(3)]
    np.testing.assert_allclose(np.asarray(multi),
                               np.mean([np.asarray(s) for s in single], axis=0),
                               rtol=1e-5)


def test_aq_flat_search():
    from ripor_tpu.evaluation.retriever import aq_flat_search
    from ripor_tpu.quantize import train_rq, rq_encode
    rng = np.random.default_rng(0)
    docs = rng.standard_normal((200, 16)).astype(np.float32)
    books = train_rq(docs, M=4, K=16, kmeans_iters=10)
    codes = rq_encode(books, docs, beam=2)
    s, i = aq_flat_search(docs[:5], books, codes, k=3)
    # reconstruction retrieval should mostly recover the doc itself at top
    hits = sum(int(q in i[q]) for q in range(5))
    assert hits >= 4, i[:5]
