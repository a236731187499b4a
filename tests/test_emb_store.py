"""Sharded embedding store (data/emb_store.py) + the index/merge/aq CLI
tasks — parity with the reference's store_embs / aggregate_embs_to_mmap
artifact formats (reference tasks/evaluator.py:494-555,636-692)."""
import json
import os

import numpy as np

from ripor_tpu.data.emb_store import (
    ShardWriter,
    host_shard_slice,
    iter_shards,
    merge_to_mmap,
    open_mmap,
    write_plan,
)


def test_shard_writer_roundtrip(tmp_path, np_rng):
    d = 16
    all_embs, all_ids = [], []
    for rank in range(2):
        w = ShardWriter(tmp_path / "embs", rank=rank, chunk_size=7)
        for b in range(3):
            e = np_rng.normal(size=(5, d)).astype(np.float32)
            ids = [f"r{rank}b{b}i{i}" for i in range(5)]
            w.add(e, ids)
            all_embs.append(e)
            all_ids.extend(ids)
        n = w.finalize()
        assert n == 3  # 15 rows / chunk 7 -> 2 full + tail
    plan = write_plan(tmp_path / "embs", nranks=2)
    assert plan["num_chunks"] == {"0": 3, "1": 3}

    chunks = list(iter_shards(tmp_path / "embs"))
    assert sum(c[0].shape[0] for c in chunks) == 30

    path, total = merge_to_mmap(tmp_path / "embs", tmp_path / "mmap")
    assert total == 30 and os.path.exists(path)
    arr, ids = open_mmap(tmp_path / "mmap")
    np.testing.assert_allclose(np.asarray(arr),
                               np.concatenate(all_embs, axis=0), rtol=1e-6)
    assert ids == all_ids  # rank-major, chunk order preserved


def test_host_shard_slice_partitions():
    total = 103
    seen = []
    for r in range(8):
        sl = host_shard_slice(total, r, 8)
        seen.extend(range(*sl.indices(total)))
    assert seen == list(range(total))


def test_cli_aq_and_hnsw_index(tmp_path, np_rng):
    from ripor_tpu.cli.main import main

    # synthetic mmap dir (as merge-embs would write it)
    d, n = 8, 200
    x = np_rng.normal(size=(n, d)).astype(np.float32)
    mdir = tmp_path / "mmap"
    mdir.mkdir()
    mm = np.memmap(mdir / "doc_embeds.mmap", np.float32, "w+", shape=(n, d))
    mm[:] = x
    mm.flush()
    with open(mdir / "text_ids.tsv", "w") as f:
        f.writelines(f"doc{i}\n" for i in range(n))
    with open(mdir / "meta.json", "w") as f:
        json.dump({"rows": n, "dim": d, "dtype": "float32"}, f)

    out = tmp_path / "aq"
    main(["aq-index", "--mmap-dir", str(mdir), "--out-dir", str(out),
          "--M", "4", "--K", "8", "--kmeans-iters", "5"])
    with open(out / "docid_to_smtid.json") as f:
        d2s = json.load(f)
    assert len(d2s) == n
    assert all(v[0] == -1 and len(v) == 5 for v in d2s.values())

    idx_dir = tmp_path / "hnsw"
    main(["hnsw-index", "--mmap-dir", str(mdir), "--index-dir", str(idx_dir),
          "--num-links", "8", "--ef-construct", "32"])
    from ripor_tpu.evaluation.hnsw import HnswIndex
    loaded = HnswIndex.load(str(idx_dir))
    ids, scores = loaded.search(x[:3], k=1, ef_search=64)
    exact = np.argmax(x[:3] @ x.T, axis=1)  # MIPS argmax (not identity!)
    assert (ids[:, 0] == exact).mean() >= 2 / 3
    assert loaded.docids[0] == "doc0"
