from ripor_tpu.trie.build import DocIdTrie, build_trie
from ripor_tpu.trie.succinct import (
    TrieTables,
    dummy_tables,
    succinct_tables,
    tables_memory_bytes,
)

__all__ = ["DocIdTrie", "build_trie", "TrieTables", "succinct_tables",
           "dummy_tables", "tables_memory_bytes"]
