"""Multi-process worker for tests/test_multiprocess.py.

Run as ``python tests/mp_worker.py RANK NPROCS PORT WORKDIR``. Exercises the
real multi-host bring-up the reference gets from torch.distributed.launch
(reference t5_pretrainer/evaluate.py:181-182, full_scripts/*.sh): each OS
process owns 2 forced-CPU devices, joins the cluster through
``core.mesh.distributed_init`` (Gloo CPU collectives), builds the global
('data','model') mesh, trains a tiny RiporModel for a few steps feeding only
its LOCAL batch shard (the DistributedSampler contract), then writes its
per-rank embedding shard and — on rank 0 — merges all shards
(``emb_store.merge_to_mmap``, the reference's cross-process artifact merge,
evaluate.py:457-526).

With NPROCS=1 the same script runs single-process over the same global
device count, producing the oracle result the test compares against.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

rank, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
workdir = sys.argv[4]
n_global_devices = 4
local_devices = n_global_devices // nprocs
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={local_devices}")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from ripor_tpu.core.mesh import (  # noqa: E402
    MeshSpec, create_mesh, distributed_init, is_first_process)

distributed_init(f"localhost:{port}", num_processes=nprocs, process_id=rank)
assert jax.device_count() == n_global_devices, jax.device_count()
assert jax.local_device_count() == local_devices

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ripor_tpu.data.emb_store import (  # noqa: E402
    ShardWriter, host_shard_slice, merge_to_mmap, open_mmap, write_plan)
from ripor_tpu.models import RiporModel  # noqa: E402
from ripor_tpu.models.ripor import init_ripor_params  # noqa: E402
from ripor_tpu.pipeline.e2e import _small_cfg  # noqa: E402
from ripor_tpu.train import TrainConfig, Trainer  # noqa: E402

mesh = create_mesh(MeshSpec(data=-1, model=1))

cfg = _small_cfg(M=4, K=16, vocab_size=64)
model = RiporModel(cfg)
params = init_ripor_params(jax.random.PRNGKey(0), cfg)

# deterministic GLOBAL batches; every process feeds only its local slice
GLOBAL_BZ, STEPS, L = 8, 4, 12
data_rng = np.random.default_rng(7)
local = host_shard_slice(GLOBAL_BZ, rank, nprocs)


def batches():
    for _ in range(STEPS):
        ids = data_rng.integers(2, 64, size=(GLOBAL_BZ, L))
        codes = data_rng.integers(0, 16, size=(GLOBAL_BZ, cfg.M))
        batch = {"query_ids": ids.astype(np.int32),
                 "query_mask": np.ones((GLOBAL_BZ, L), np.int32),
                 "codes": codes.astype(np.int32)}
        yield {k: v[local] for k, v in batch.items()}


tcfg = TrainConfig(loss_type="t5seq_aq_encoder_seq2seq", learning_rate=1e-3,
                   total_steps=STEPS, bf16_compute=False)
trainer = Trainer(model, tcfg, params, mesh=mesh)
state, metrics = trainer.run(batches(), jax.random.PRNGKey(1), log_every=10_000)

final_loss = float(metrics["loss"])
# params are replicated: every process can read them; fingerprint them
flat = jax.tree.leaves(state.params)
checksum = float(sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in flat))

# ---- cross-process artifact merge (per-rank shards -> one mmap) --------
emb_dir = os.path.join(workdir, "embs")
os.makedirs(emb_dir, exist_ok=True)
N_DOCS, D = 20, 8
all_embs = np.arange(N_DOCS * D, dtype=np.float32).reshape(N_DOCS, D)
sl = host_shard_slice(N_DOCS, rank, nprocs)
writer = ShardWriter(emb_dir, rank=rank, chunk_size=6)
writer.add(all_embs[sl], [f"d{i}" for i in range(N_DOCS)][sl])
writer.finalize()

# barrier so every rank's shard files exist before rank 0 merges
from jax.experimental import multihost_utils  # noqa: E402

multihost_utils.sync_global_devices("emb_shards_written")

merged_rows = None
if is_first_process():
    write_plan(emb_dir, nranks=nprocs)
    mmap_dir = os.path.join(workdir, "mmap")
    merge_to_mmap(emb_dir, mmap_dir, d=D)
    arr, ids = open_mmap(mmap_dir)
    assert arr.shape == (N_DOCS, D), arr.shape
    assert ids == [f"d{i}" for i in range(N_DOCS)], ids[:4]
    np.testing.assert_array_equal(np.asarray(arr), all_embs)
    merged_rows = int(arr.shape[0])

with open(os.path.join(workdir, f"result_{rank}.json"), "w") as f:
    json.dump({"loss": final_loss, "checksum": checksum,
               "processes": jax.process_count(),
               "merged_rows": merged_rows}, f)
print("worker", rank, "done", final_loss, flush=True)
