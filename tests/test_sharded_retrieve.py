"""Sharded retrieval + run merge through the CLI (reference DDP decode +
t5seq_aq_retrieve_docids_2 merge, evaluate.py:457-526): two ranks run
sequentially in-process and the merged run must equal the single-rank run."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ripor_tpu.cli.main import main as cli_main
from ripor_tpu.data import UnigramTokenizer, save_docid_to_smtid
from ripor_tpu.models import RiporConfig, RiporModel, T5Config
from ripor_tpu.models.ripor import init_ripor_params
from ripor_tpu.pipeline.recipe import Workspace
from ripor_tpu.train import save_params


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("shard_ws")
    ws = Workspace(tmp / "ws")
    cfg = RiporConfig(
        t5=T5Config(vocab_size=300, d_model=64, d_kv=16, d_ff=128,
                    num_layers=2, num_decoder_layers=2, num_heads=4,
                    dropout_rate=0.0),
        M=4, K=16)
    params = init_ripor_params(jax.random.PRNGKey(0), cfg)
    save_params(ws.path("checkpoints/final"), params, cfg)

    corpus = [f"document number {i} about subject {i % 7}" for i in range(30)]
    tok = UnigramTokenizer.train(corpus, vocab_size=300)
    tok.save(ws.path("tokenizer.json"))

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 16, (30, 4))
    save_docid_to_smtid(ws.path("docid_to_smtid.json"),
                        [f"d{i}" for i in range(30)], codes)

    qdir = tmp / "queries"
    qdir.mkdir()
    with open(qdir / "raw.tsv", "w") as f:
        for i in range(5):
            f.write(f"q{i}\tsubject {i} document\n")
    return ws, qdir


def test_sharded_retrieve_matches_single(workspace):
    ws, qdir = workspace
    base = ["retrieve", "--workspace", str(ws.root), "--queries", str(qdir),
            "--beam", "4", "--topk", "10"]
    cli_main(base + ["--run-name", "run_single.json"])

    for rank in (0, 1):
        cli_main(base + ["--rank", str(rank), "--nranks", "2"])
    assert ws.path("run_0.json").exists() and ws.path("run_1.json").exists()
    cli_main(["retrieve-merge", "--workspace", str(ws.root), "--nranks", "2"])

    single = json.loads(ws.path("run_single.json").read_text())
    merged = json.loads(ws.path("run.json").read_text())
    assert set(merged) == set(single) == {f"q{i}" for i in range(5)}
    for qid in single:
        assert merged[qid].keys() == single[qid].keys()
        for d in single[qid]:
            np.testing.assert_allclose(merged[qid][d], single[qid][d],
                                       rtol=1e-5)
    # shards removed by default
    assert not ws.path("run_0.json").exists()


def test_retrieve_merge_missing_shard(workspace):
    ws, _ = workspace
    with pytest.raises(SystemExit):
        cli_main(["retrieve-merge", "--workspace", str(ws.root),
                  "--nranks", "3"])
