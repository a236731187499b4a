// hnsw — native approximate nearest-neighbor index (inner product).
//
// TPU-native replacement for the reference's faiss IndexHNSWFlat dense
// baseline (reference tasks/evaluator.py:28-190: IndexHNSWFlat(768,
// num_links, METRIC_INNER_PRODUCT), efConstruction=128). Graph ANN is a
// host-side data structure (SURVEY.md §2.4), so this lives in C++ beside
// the trie builder, exposed over the same plain-C ABI for ctypes.
//
// Algorithm: Malkov & Yashunin HNSW with the select-neighbors heuristic,
// per-node spin locks for parallel insertion and lock-free parallel query
// (reads are safe post-build). Similarity = inner product (max-heap order),
// matching METRIC_INNER_PRODUCT.
//
// Build: make -C native   (compiled into libripor_native.so)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <random>
#include <thread>
#include <vector>

namespace {

struct Hnsw {
  int32_t d = 0;
  int32_t M = 16;        // max links per node, upper levels
  int32_t M0 = 32;       // max links at level 0 (2*M)
  int32_t efC = 128;
  double mult = 0.0;     // 1 / ln(M)
  int64_t N = 0;
  int32_t max_level = -1;
  int64_t enter_point = -1;
  std::vector<float> vecs;                         // [N * d]
  std::vector<int32_t> levels;                     // [N]
  // nbrs[i][l] — neighbor ids of node i at level l (l <= levels[i])
  std::vector<std::vector<std::vector<int32_t>>> nbrs;
  std::vector<std::mutex> locks;                   // sized N at build
  std::mutex global;

  explicit Hnsw(int64_t n) : locks(static_cast<size_t>(n > 0 ? n : 1)) {}

  inline const float* vec(int64_t i) const { return vecs.data() + i * d; }

  inline float sim(const float* a, const float* b) const {
    float s = 0.f;
    for (int32_t j = 0; j < d; ++j) s += a[j] * b[j];
    return s;
  }
};

// (similarity, id) — max by similarity
using SimId = std::pair<float, int64_t>;

void get_neighbors(Hnsw& h, int64_t node, int32_t level, bool locked,
                   std::vector<int32_t>& out) {
  if (locked) {
    std::lock_guard<std::mutex> g(h.locks[node]);
    out = h.nbrs[node][level];
  } else {
    out = h.nbrs[node][level];
  }
}

// Greedy 1-NN walk at `level` starting from `entry`; returns the local max.
int64_t greedy_closest(Hnsw& h, const float* q, int64_t entry, int32_t level,
                       bool locked) {
  int64_t cur = entry;
  float cur_sim = h.sim(q, h.vec(cur));
  std::vector<int32_t> nb;
  for (;;) {
    bool improved = false;
    get_neighbors(h, cur, level, locked, nb);
    for (int32_t c : nb) {
      float s = h.sim(q, h.vec(c));
      if (s > cur_sim) { cur_sim = s; cur = c; improved = true; }
    }
    if (!improved) return cur;
  }
}

// Beam search at one level; returns up to `ef` best (similarity-descending).
void search_layer(Hnsw& h, const float* q, int64_t entry, int32_t level,
                  int32_t ef, bool locked, std::vector<uint8_t>& visited,
                  std::vector<SimId>& out) {
  std::fill(visited.begin(), visited.end(), 0);
  // candidates: max-heap by sim; results: min-heap by sim (prune worst)
  std::priority_queue<SimId> cand;
  std::priority_queue<SimId, std::vector<SimId>, std::greater<SimId>> res;
  float s0 = h.sim(q, h.vec(entry));
  cand.push({s0, entry});
  res.push({s0, entry});
  visited[entry] = 1;
  std::vector<int32_t> nb;
  while (!cand.empty()) {
    SimId c = cand.top();
    cand.pop();
    if ((int32_t)res.size() >= ef && c.first < res.top().first) break;
    get_neighbors(h, c.second, level, locked, nb);
    for (int32_t e : nb) {
      if (visited[e]) continue;
      visited[e] = 1;
      float s = h.sim(q, h.vec(e));
      if ((int32_t)res.size() < ef || s > res.top().first) {
        cand.push({s, e});
        res.push({s, e});
        if ((int32_t)res.size() > ef) res.pop();
      }
    }
  }
  out.clear();
  out.reserve(res.size());
  while (!res.empty()) { out.push_back(res.top()); res.pop(); }
  std::reverse(out.begin(), out.end());  // best first
}

// Paper heuristic (Algorithm 4) in similarity form: scan candidates
// best-first; keep c unless it is closer to an already-selected node than
// to the query (dominated -> redundant edge).
void select_neighbors(Hnsw& h, const std::vector<SimId>& cand_best_first,
                      int32_t m, std::vector<int32_t>& out) {
  out.clear();
  for (const SimId& c : cand_best_first) {
    if ((int32_t)out.size() >= m) break;
    bool keep = true;
    const float* cv = h.vec(c.second);
    for (int32_t s : out) {
      if (h.sim(cv, h.vec(s)) > c.first) { keep = false; break; }
    }
    if (keep) out.push_back((int32_t)c.second);
  }
}

void prune_node(Hnsw& h, int64_t node, int32_t level, int32_t cap) {
  // caller holds h.locks[node]
  auto& lst = h.nbrs[node][level];
  if ((int32_t)lst.size() <= cap) return;
  const float* nv = h.vec(node);
  std::vector<SimId> cand;
  cand.reserve(lst.size());
  for (int32_t e : lst) cand.push_back({h.sim(nv, h.vec(e)), e});
  std::sort(cand.rbegin(), cand.rend());
  std::vector<int32_t> kept;
  select_neighbors(h, cand, cap, kept);
  lst = std::move(kept);
}

void insert_one(Hnsw& h, int64_t i, std::vector<uint8_t>& visited) {
  const float* q = h.vec(i);
  const int32_t level = h.levels[i];

  int64_t ep;
  int32_t top;
  {
    std::lock_guard<std::mutex> g(h.global);
    ep = h.enter_point;
    top = h.max_level;
    if (ep < 0) {  // first node
      h.enter_point = i;
      h.max_level = level;
      return;
    }
  }

  for (int32_t l = top; l > level; --l) ep = greedy_closest(h, q, ep, l, true);

  std::vector<SimId> found;
  std::vector<int32_t> sel;
  for (int32_t l = std::min(level, top); l >= 0; --l) {
    search_layer(h, q, ep, l, h.efC, true, visited, found);
    const int32_t cap = (l == 0) ? h.M0 : h.M;
    select_neighbors(h, found, h.M, sel);
    {
      std::lock_guard<std::mutex> g(h.locks[i]);
      h.nbrs[i][l] = sel;
    }
    for (int32_t e : sel) {
      std::lock_guard<std::mutex> g(h.locks[e]);
      h.nbrs[e][l].push_back((int32_t)i);
      prune_node(h, e, l, cap);
    }
    if (!found.empty()) ep = found[0].second;
  }

  if (level > top) {
    std::lock_guard<std::mutex> g(h.global);
    if (level > h.max_level) {
      h.max_level = level;
      h.enter_point = i;
    }
  }
}

void parallel_for(int64_t begin, int64_t end, int32_t n_threads,
                  const std::function<void(int64_t, int32_t)>& fn) {
  if (n_threads <= 1 || end - begin <= 1) {
    for (int64_t i = begin; i < end; ++i) fn(i, 0);
    return;
  }
  std::atomic<int64_t> next(begin);
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int32_t t = 0; t < n_threads; ++t) {
    pool.emplace_back([&, t]() {
      for (;;) {
        int64_t i = next.fetch_add(1);
        if (i >= end) return;
        fn(i, t);
      }
    });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

void* hnsw_build(const float* vecs, int64_t N, int32_t d, int32_t M,
                 int32_t ef_construct, int32_t n_threads, uint64_t seed) {
  if (N <= 0 || d <= 0 || M < 2) return nullptr;
  Hnsw* h = new Hnsw(N);
  h->d = d;
  h->M = M;
  h->M0 = 2 * M;
  h->efC = ef_construct;
  h->mult = 1.0 / std::log((double)M);
  h->N = N;
  h->vecs.assign(vecs, vecs + N * d);
  h->levels.resize(N);
  h->nbrs.resize(N);
  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<double> uni(0.0, 1.0);
  for (int64_t i = 0; i < N; ++i) {
    double u = uni(rng);
    int32_t lv = (int32_t)(-std::log(std::max(u, 1e-12)) * h->mult);
    h->levels[i] = lv;
    h->nbrs[i].resize(lv + 1);
  }
  if (n_threads <= 0) n_threads = (int32_t)std::thread::hardware_concurrency();

  // a short sequential prefix stabilizes the entry point before going wide
  const int64_t seq = std::min<int64_t>(N, 256);
  std::vector<uint8_t> visited0(N, 0);
  for (int64_t i = 0; i < seq; ++i) insert_one(*h, i, visited0);
  parallel_for(seq, N, n_threads, [&](int64_t i, int32_t t) {
    thread_local std::vector<uint8_t> visited;
    if ((int64_t)visited.size() != N) visited.assign(N, 0);
    insert_one(*h, i, visited);
  });
  return h;
}

int hnsw_search(void* handle, const float* queries, int64_t nq, int32_t k,
                int32_t ef_search, int64_t* out_ids, float* out_scores,
                int32_t n_threads) {
  Hnsw* h = (Hnsw*)handle;
  if (!h || nq <= 0 || k <= 0) return -1;
  const int32_t ef = std::max(ef_search, k);
  if (n_threads <= 0) n_threads = (int32_t)std::thread::hardware_concurrency();
  parallel_for(0, nq, n_threads, [&](int64_t qi, int32_t t) {
    thread_local std::vector<uint8_t> visited;
    if ((int64_t)visited.size() != h->N) visited.assign(h->N, 0);
    const float* q = queries + qi * h->d;
    int64_t ep = h->enter_point;
    for (int32_t l = h->max_level; l > 0; --l)
      ep = greedy_closest(*h, q, ep, l, false);
    std::vector<SimId> found;
    search_layer(*h, q, ep, 0, ef, false, visited, found);
    for (int32_t r = 0; r < k; ++r) {
      if (r < (int32_t)found.size()) {
        out_ids[qi * k + r] = found[r].second;
        out_scores[qi * k + r] = found[r].first;
      } else {
        out_ids[qi * k + r] = -1;
        out_scores[qi * k + r] = -1e30f;
      }
    }
  });
  return 0;
}

int64_t hnsw_size(void* handle) { return handle ? ((Hnsw*)handle)->N : 0; }
int32_t hnsw_dim(void* handle) { return handle ? ((Hnsw*)handle)->d : 0; }

int hnsw_save(void* handle, const char* path) {
  Hnsw* h = (Hnsw*)handle;
  if (!h) return -1;
  FILE* f = fopen(path, "wb");
  if (!f) return -2;
  const char magic[8] = {'R', 'P', 'H', 'N', 'S', 'W', '0', '1'};
  fwrite(magic, 1, 8, f);
  int64_t hdr[6] = {h->N, h->d, h->M, h->efC, h->max_level, h->enter_point};
  fwrite(hdr, sizeof(int64_t), 6, f);
  fwrite(h->levels.data(), sizeof(int32_t), h->N, f);
  fwrite(h->vecs.data(), sizeof(float), h->N * h->d, f);
  for (int64_t i = 0; i < h->N; ++i) {
    for (int32_t l = 0; l <= h->levels[i]; ++l) {
      int32_t n = (int32_t)h->nbrs[i][l].size();
      fwrite(&n, sizeof(int32_t), 1, f);
      fwrite(h->nbrs[i][l].data(), sizeof(int32_t), n, f);
    }
  }
  fclose(f);
  return 0;
}

void* hnsw_load(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  char magic[8];
  if (fread(magic, 1, 8, f) != 8 || memcmp(magic, "RPHNSW01", 8) != 0) {
    fclose(f);
    return nullptr;
  }
  int64_t hdr[6];
  if (fread(hdr, sizeof(int64_t), 6, f) != 6) { fclose(f); return nullptr; }
  Hnsw* h = new Hnsw(hdr[0]);
  h->N = hdr[0];
  h->d = (int32_t)hdr[1];
  h->M = (int32_t)hdr[2];
  h->M0 = 2 * h->M;
  h->efC = (int32_t)hdr[3];
  h->max_level = (int32_t)hdr[4];
  h->enter_point = hdr[5];
  h->mult = 1.0 / std::log((double)h->M);
  h->levels.resize(h->N);
  h->vecs.resize(h->N * h->d);
  bool ok = fread(h->levels.data(), sizeof(int32_t), h->N, f) == (size_t)h->N &&
            fread(h->vecs.data(), sizeof(float), h->N * h->d, f) ==
                (size_t)(h->N * h->d);
  h->nbrs.resize(h->N);
  for (int64_t i = 0; ok && i < h->N; ++i) {
    h->nbrs[i].resize(h->levels[i] + 1);
    for (int32_t l = 0; ok && l <= h->levels[i]; ++l) {
      int32_t n = 0;
      ok = fread(&n, sizeof(int32_t), 1, f) == 1 && n >= 0;
      if (!ok) break;
      h->nbrs[i][l].resize(n);
      ok = fread(h->nbrs[i][l].data(), sizeof(int32_t), n, f) == (size_t)n;
    }
  }
  fclose(f);
  if (!ok) { delete h; return nullptr; }
  return h;
}

void hnsw_free(void* handle) { delete (Hnsw*)handle; }

}  // extern "C"
