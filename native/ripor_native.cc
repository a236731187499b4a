// ripor_native — C++ host-side components.
//
// The reference delegated its host-side hot spots to native libraries
// (faiss C++ for RQ, pytrec_eval C++ for metrics, scipy CSR for trie
// transitions — SURVEY.md §2.4). This library provides the TPU-framework
// equivalents for the pieces that stay on the host:
//
//   * trie_build:   DocID-trie construction over millions of code rows
//                   (parallel-sort + run detection; replaces the numpy
//                   builder for the 8.8M-doc scale).
//   * eval_metrics: trec-eval-compatible MRR@k / recall@k / nDCG@k over
//                   encoded run arrays (pytrec_eval replacement).
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: make -C native   (produces libripor_native.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Trie builder
// ---------------------------------------------------------------------------
// Semantics identical to ripor_tpu/trie/build.py::build_trie:
//   children[node][token] = child internal id (>=0) | -1 (invalid)
//                           | -2 - group (singleton chain)
// Output buffers are malloc'd here; caller must call ripor_free on each.

struct TrieOut {
  int32_t* children;        // [num_internal * K]
  int64_t num_internal;
  int32_t* unique_codes;    // [num_groups * M]
  int64_t num_groups;
  int64_t* group_offsets;   // [num_groups + 1]
  int32_t* group_docids;    // [N]
};

void ripor_free(void* p) { free(p); }

static inline bool row_less(const int32_t* a, const int32_t* b, int M) {
  for (int i = 0; i < M; ++i) {
    if (a[i] != b[i]) return a[i] < b[i];
  }
  return false;
}

int trie_build(const int32_t* codes, int64_t N, int32_t M, int32_t K,
               TrieOut* out) {
  if (N <= 0 || M <= 0 || K <= 0) return -1;
  // 1) sort doc indices by code row (lexicographic)
  std::vector<int32_t> order(N);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(), [&](int32_t x, int32_t y) {
    return row_less(codes + (int64_t)x * M, codes + (int64_t)y * M, M);
  });

  // 2) unique rows -> groups; group_docids CSR
  std::vector<int64_t> group_start;  // index into `order` where group begins
  group_start.reserve(N / 4 + 1);
  for (int64_t i = 0; i < N; ++i) {
    if (i == 0 || row_less(codes + (int64_t)order[i - 1] * M,
                           codes + (int64_t)order[i] * M, M)) {
      group_start.push_back(i);
    }
  }
  const int64_t G = (int64_t)group_start.size();
  out->num_groups = G;
  out->unique_codes = (int32_t*)malloc(sizeof(int32_t) * G * M);
  out->group_offsets = (int64_t*)malloc(sizeof(int64_t) * (G + 1));
  out->group_docids = (int32_t*)malloc(sizeof(int32_t) * N);
  for (int64_t g = 0; g < G; ++g) {
    const int32_t* row = codes + (int64_t)order[group_start[g]] * M;
    memcpy(out->unique_codes + g * M, row, sizeof(int32_t) * M);
    out->group_offsets[g] = group_start[g];
  }
  out->group_offsets[G] = N;
  for (int64_t i = 0; i < N; ++i) out->group_docids[i] = order[i];

  // 3) per-level runs over unique rows; assign internal ids; fill children.
  // run id at level l for group g: computed incrementally.
  const int32_t* U = out->unique_codes;
  std::vector<int64_t> run_id_prev(G, 0);   // level-l run id per group
  std::vector<int64_t> internal_prev;       // internal id per level-l run
  internal_prev.push_back(0);               // root is internal id 0
  int64_t next_internal = 1;

  // first pass: count internal nodes per level to size `children`
  // (simpler: build edges into a vector of (parent, token, child) then fill)
  struct Edge { int64_t parent; int32_t token; int64_t child; };
  std::vector<Edge> edges;
  edges.reserve(G * 2);

  for (int32_t level = 0; level < M; ++level) {
    // child runs at level+1: boundaries where prefix[0..level] changes
    // compute run ids at level+1 and run starts
    std::vector<int64_t> run_start;
    run_start.reserve(G / 2 + 1);
    std::vector<int64_t> run_id_next(G);
    int64_t rid = -1;
    for (int64_t g = 0; g < G; ++g) {
      bool newrun = (g == 0) || (run_id_prev[g] != run_id_prev[g - 1]) ||
                    (U[g * M + level] != U[(g - 1) * M + level]);
      if (newrun) { run_start.push_back(g); ++rid; }
      run_id_next[g] = rid;
    }
    const int64_t R = (int64_t)run_start.size();
    // internal ids for level+1 runs (length >= 2), and edges from parents
    std::vector<int64_t> internal_next(R, -1);
    for (int64_t r = 0; r < R; ++r) {
      const int64_t s = run_start[r];
      const int64_t e = (r + 1 < R) ? run_start[r + 1] : G;
      const int64_t parent = internal_prev[run_id_prev[s]];
      if (parent < 0) continue;  // inside a singleton chain
      int64_t child;
      if (level + 1 < M && e - s >= 2) {
        child = internal_next[r] = next_internal++;
      } else if (e - s >= 2) {
        // full-length duplicate rows cannot happen (rows unique)
        child = -2 - s;
      } else {
        child = -2 - s;  // singleton group, row index == s
      }
      edges.push_back({parent, U[s * M + level], child});
      if (level + 1 < M && e - s >= 2) internal_next[r] = child;
    }
    run_id_prev.swap(run_id_next);
    internal_prev.swap(internal_next);
  }

  out->num_internal = next_internal;
  out->children = (int32_t*)malloc(sizeof(int32_t) * next_internal * K);
  std::fill(out->children, out->children + next_internal * K, -1);
  for (const Edge& e : edges) {
    out->children[e.parent * K + e.token] = (int32_t)e.child;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// trec-eval metrics
// ---------------------------------------------------------------------------
// Inputs are flattened per-query arrays. Ranking uses trec_eval ordering:
// score descending, tie-break docid-key descending (caller encodes docid
// strings as int64 keys whose order equals string order).
//
// For each query q: run results [run_off[q], run_off[q+1]) with
// (run_key, run_score); qrel entries [qrel_off[q], qrel_off[q+1]) with
// (qrel_key, qrel_rel). Outputs per-query metric values.

static void rank_indices(const int64_t* keys, const float* scores,
                         int64_t n, std::vector<int32_t>& idx) {
  idx.resize(n);
  std::iota(idx.begin(), idx.end(), 0);
  std::sort(idx.begin(), idx.end(), [&](int32_t a, int32_t b) {
    if (scores[a] != scores[b]) return scores[a] > scores[b];
    return keys[a] > keys[b];
  });
}

int eval_metrics(const int64_t* run_keys, const float* run_scores,
                 const int64_t* run_off,
                 const int64_t* qrel_keys, const int32_t* qrel_rels,
                 const int64_t* qrel_off,
                 int64_t n_queries, int32_t k, int32_t metric,
                 // metric: 0 = mrr@k (run truncated to top-k),
                 //         1 = recall@k, 2 = ndcg_cut@k
                 double* out_per_query) {
  std::vector<int32_t> idx;
  for (int64_t q = 0; q < n_queries; ++q) {
    const int64_t rs = run_off[q], re = run_off[q + 1];
    const int64_t qs = qrel_off[q], qe = qrel_off[q + 1];
    rank_indices(run_keys + rs, run_scores + rs, re - rs, idx);
    const int64_t top = std::min<int64_t>(k, re - rs);

    auto rel_of = [&](int64_t key) -> int32_t {
      for (int64_t j = qs; j < qe; ++j) {
        if (qrel_keys[j] == key) return qrel_rels[j];
      }
      return 0;
    };

    double v = 0.0;
    if (metric == 0) {  // MRR@k
      for (int64_t r = 0; r < top; ++r) {
        if (rel_of(run_keys[rs + idx[r]]) > 0) { v = 1.0 / (double)(r + 1); break; }
      }
    } else if (metric == 1) {  // recall@k
      int64_t nrel = 0;
      for (int64_t j = qs; j < qe; ++j) nrel += qrel_rels[j] > 0;
      if (nrel == 0) { out_per_query[q] = -1.0; continue; }  // skip marker
      int64_t hit = 0;
      for (int64_t r = 0; r < top; ++r) {
        if (rel_of(run_keys[rs + idx[r]]) > 0) ++hit;
      }
      v = (double)hit / (double)nrel;
    } else {  // ndcg_cut@k
      double dcg = 0.0;
      for (int64_t r = 0; r < top; ++r) {
        const int32_t rel = rel_of(run_keys[rs + idx[r]]);
        if (rel > 0) dcg += (double)rel / std::log2((double)r + 2.0);
      }
      std::vector<int32_t> rels;
      for (int64_t j = qs; j < qe; ++j) {
        if (qrel_rels[j] > 0) rels.push_back(qrel_rels[j]);
      }
      std::sort(rels.rbegin(), rels.rend());
      double idcg = 0.0;
      for (size_t r = 0; r < rels.size() && (int64_t)r < k; ++r) {
        idcg += (double)rels[r] / std::log2((double)r + 2.0);
      }
      v = idcg > 0 ? dcg / idcg : 0.0;
    }
    out_per_query[q] = v;
  }
  return 0;
}

}  // extern "C"
