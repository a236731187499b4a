"""Succinct trie tables (trie/succinct.py): bitmask + rank-addressed edges
must reproduce the dense child table exactly, and the decode-side lookups
(_trie_allowed/_trie_child) must match dense-table semantics."""
import jax
import jax.numpy as jnp
import numpy as np

from ripor_tpu.decode.beam import _trie_allowed, _trie_child
from ripor_tpu.trie import build_trie, succinct_tables, tables_memory_bytes
from ripor_tpu.trie.succinct import TrieTables


def _random_trie(np_rng, n_docs=200, M=6, K=37):
    codes = np_rng.integers(0, K, (n_docs, M)).astype(np.int32)
    return build_trie(codes, K), codes


def test_tables_reproduce_dense_children(np_rng):
    trie, _ = _random_trie(np_rng)
    tables = succinct_tables(trie)
    K = trie.K
    nodes = trie.children.shape[0]
    # reconstruct the dense table from bits + edges
    recon = np.full((nodes, K), -1, np.int32)
    for n in range(nodes):
        e = int(tables.node_base[n])
        for tok in range(K):
            w, r = tok // 32, tok % 32
            if (int(tables.bits[n, w]) >> r) & 1:
                recon[n, tok] = tables.edge_child[e]
                e += 1
        assert e == int(tables.node_base[n + 1])
    np.testing.assert_array_equal(recon, trie.children)
    assert tables_memory_bytes(tables) < trie.children.nbytes


def test_device_lookups_match_dense(np_rng):
    trie, _ = _random_trie(np_rng, K=64)
    tables = jax.tree.map(jnp.asarray, succinct_tables(trie))
    K = trie.K
    nodes = trie.children.shape[0]
    # states: mix of internal nodes, chains, dead
    state = np.array([[0, nodes - 1, -1, -2, -5, 1]], np.int32)
    t = 1
    allowed = np.asarray(_trie_allowed(tables, jnp.asarray(state), t, K))
    for i, st in enumerate(state[0]):
        if st >= 0:
            expect = trie.children[st] != -1
        elif st <= -2:
            g = -2 - st
            expect = np.zeros(K, bool)
            expect[trie.unique_codes[g, t]] = True
        else:
            expect = np.zeros(K, bool)
        np.testing.assert_array_equal(allowed[0, i], expect, err_msg=str(st))

    # child lookup for every allowed (internal state, token) pair
    for st in [0, 1, nodes - 1]:
        toks = np.flatnonzero(trie.children[st] != -1)
        if len(toks) == 0:
            continue
        st_arr = jnp.full((1, len(toks)), st, jnp.int32)
        tok_arr = jnp.asarray(toks[None, :], jnp.int32)
        child = np.asarray(_trie_child(tables, st_arr, tok_arr))[0]
        np.testing.assert_array_equal(child, trie.children[st, toks])


def test_bitmask_word_boundaries(np_rng):
    # tokens straddling 32-bit word boundaries (K not a multiple of 32)
    trie, _ = _random_trie(np_rng, n_docs=500, M=3, K=70)
    tables = jax.tree.map(jnp.asarray, succinct_tables(trie))
    toks = np.flatnonzero(trie.children[0] != -1)
    st_arr = jnp.zeros((1, len(toks)), jnp.int32)
    child = np.asarray(_trie_child(tables, st_arr,
                                   jnp.asarray(toks[None, :], jnp.int32)))[0]
    np.testing.assert_array_equal(child, trie.children[0, toks])
