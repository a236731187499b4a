"""Train-step throughput/MFU benchmark (t5-base, phase-2 seq2seq geometry:
batch 256, len 64 — reference full_train_t5seq_seq2seq_0_1_pipeline.sh:19-35).
Measured on one TPU v5e chip: ~292 ms/step, ~875 examples/s, 0.59 MFU.
Usage: python tools/bench_train.py"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
import numpy as np
from ripor_tpu.models import RiporModel, ripor_base
from ripor_tpu.train import TrainConfig
from ripor_tpu.train.trainer import TrainState, make_optimizer, make_train_step

backbone = os.environ.get("BENCH_TRAIN_MODEL", "t5-base")
if backbone == "t5-base":
    cfg = ripor_base(M=32, K=256)
else:
    from ripor_tpu.models.config import _NAMED_T5, RiporConfig
    cfg = RiporConfig(t5=_NAMED_T5[backbone](), M=32, K=256)
if os.environ.get("BENCH_TRAIN_REMAT", "") == "1":
    import dataclasses
    cfg = dataclasses.replace(cfg, t5=dataclasses.replace(cfg.t5,
                                                          remat_layers=True))
model = RiporModel(cfg, dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
B = int(os.environ.get("BENCH_TRAIN_BATCH", 256))
S = int(os.environ.get("BENCH_TRAIN_SEQ", 64))
ids = jnp.asarray(rng.integers(1, 32000, (B, S)), jnp.int32)
mask = jnp.ones_like(ids)
codes = jnp.asarray(rng.integers(0, 256, (B, 32)), jnp.int32)
shapes = jax.eval_shape(lambda k: model.init({"params": k}, ids, mask, codes)["params"], jax.random.PRNGKey(0))
params = jax.tree.map(lambda s: jnp.asarray(0.02*rng.standard_normal(s.shape), s.dtype), shapes)
n_params = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
tcfg = TrainConfig(loss_type="t5seq_aq_encoder_seq2seq", learning_rate=1e-3, total_steps=1000)
tx = make_optimizer(tcfg)
state = TrainState.create(params, tx)
step = jax.jit(make_train_step(model, tcfg, tx), donate_argnums=(0,))
batch = {"query_ids": ids, "query_mask": mask, "codes": codes}
k = jax.random.PRNGKey(1)
t0 = time.time()
state, m = step(state, batch, k)
print(f"# compile {time.time()-t0:.1f}s loss={float(m['loss']):.3f}", file=sys.stderr)
ts = []
for i in range(5):
    t0 = time.time()
    state, m = step(state, batch, k)
    _ = float(m["loss"])  # host sync
    ts.append(time.time()-t0)
dt = min(ts)
# fwd+bwd flops: ~6 * n_params * tokens (enc S + dec M per example)
tokens = B * (S + 32)
flops = 6 * n_params * tokens
print(json.dumps({"train_step_ms": round(dt*1000,1),
                  "examples_per_sec": round(B/dt,1),
                  "params_M": round(n_params/1e6,1),
                  "mfu_vs_197T": round(flops/dt/197e12, 3)}))
