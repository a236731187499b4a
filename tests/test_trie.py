"""Trie-table construction equivalence vs a dict-trie oracle."""
import numpy as np
import pytest

from ripor_tpu.trie import build_trie
from ripor_tpu.trie.build import dict_trie, dict_trie_allowed


def walk_allowed(trie, prefix):
    """Host-side walk of the device-table semantics."""
    state = 0  # root
    for t, c in enumerate(prefix):
        if state >= 0:
            nxt = trie.children[state, c]
            if nxt == -1:
                return []
            state = nxt
        elif state <= -2:
            g = -2 - state
            if trie.unique_codes[g, t] != c:
                return []
    t = len(prefix)
    if state >= 0:
        return sorted(np.flatnonzero(trie.children[state] != -1).tolist())
    g = -2 - state
    if t >= trie.M:
        return []
    return [int(trie.unique_codes[g, t])]


@pytest.mark.parametrize("n,M,K,seed", [(50, 4, 8, 0), (300, 6, 16, 1), (1000, 8, 32, 2)])
def test_trie_matches_dict_oracle(n, M, K, seed):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, K, (n, M))
    trie = build_trie(codes, K)
    oracle = dict_trie(codes)

    # every prefix of every code must agree with the oracle
    for row in codes[:200]:
        for plen in range(M):
            prefix = row[:plen].tolist()
            assert walk_allowed(trie, prefix) == dict_trie_allowed(oracle, prefix), \
                f"prefix {prefix}"

    # random invalid prefixes must be dead in both
    for _ in range(50):
        prefix = rng.integers(0, K, rng.integers(1, M)).tolist()
        assert walk_allowed(trie, prefix) == dict_trie_allowed(oracle, prefix)


def test_trie_groups_docids():
    codes = np.array([[1, 2], [1, 2], [1, 3], [0, 0]])
    trie = build_trie(codes, K=4)
    # three distinct smtids
    assert trie.num_groups == 3
    by_code = {tuple(trie.unique_codes[g]): sorted(trie.docids_of_group(g).tolist())
               for g in range(3)}
    assert by_code[(1, 2)] == [0, 1]
    assert by_code[(1, 3)] == [2]
    assert by_code[(0, 0)] == [3]


def test_trie_duplicate_heavy():
    rng = np.random.default_rng(3)
    base = rng.integers(0, 4, (10, 5))
    codes = base[rng.integers(0, 10, 500)]  # many duplicate smtids
    trie = build_trie(codes, K=4)
    assert trie.num_groups <= 10
    assert trie.group_docids.shape[0] == 500
    oracle = dict_trie(codes)
    for row in base:
        for plen in range(5):
            assert walk_allowed(trie, row[:plen].tolist()) == \
                dict_trie_allowed(oracle, row[:plen].tolist())


def test_trie_memory_is_compressed():
    """Singleton-chain compression: with near-unique codes, internal node
    count must stay near the branching levels, far below N*M."""
    rng = np.random.default_rng(4)
    codes = rng.integers(0, 256, (5000, 32))
    trie = build_trie(codes, 256)
    # ~all prefixes unique by level 2; internal nodes ~ level-1 nodes
    assert trie.num_internal < 3 * 5000
    assert trie.memory_bytes() < 64 * 1024 * 1024
