from ripor_tpu.trie.build import DocIdTrie, build_trie

__all__ = ["DocIdTrie", "build_trie"]
