// latentrag-tpu native host library: HNSW graph ANN + IVF-PQ quantization.
//
// TPU-native replacement for the FAISS index tiers the reference wraps
// (retrieval/FAISSEmbeddingRetriever.py:95-102 — IndexHNSWFlat M=32
// efC=200 efS=64, and IndexIVFPQ 4096x16x8). Exact search runs on the TPU
// (ops/ + retrieval/dense.py); graph construction and codebook training are
// irregular, pointer-chasing host workloads — the one place a C++ extension
// is justified (SURVEY §2.4 item 1) — so they live here behind a C ABI
// consumed via ctypes (no pybind11 dependency).
//
// Conventions: float32 row-major vectors; metric is inner product (callers
// pre-normalize for cosine); higher score = better. Thread-safety: batch
// add/search fan out over std::thread workers (striped per-node link locks,
// hnswlib-style) when given nthreads > 1; a built index is safe for
// concurrent read-only searches. NOT safe: search overlapping add_batch on
// the SAME index — add_batch resizes the vector store, invalidating reader
// pointers (TSAN-verified; `make tsan`). Callers must serialize add vs
// search per index (serve.py's sequential request loop does). Level
// assignment stays sequential from the seeded rng, so level structure is
// deterministic regardless of thread count (link sets can differ under
// concurrency).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <limits>
#include <memory>
#include <mutex>
#include <queue>
#include <random>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

inline float dot(const float* a, const float* b, int d) {
    float s0 = 0.f, s1 = 0.f, s2 = 0.f, s3 = 0.f;
    int i = 0;
    for (; i + 4 <= d; i += 4) {
        s0 += a[i] * b[i];
        s1 += a[i + 1] * b[i + 1];
        s2 += a[i + 2] * b[i + 2];
        s3 += a[i + 3] * b[i + 3];
    }
    for (; i < d; ++i) s0 += a[i] * b[i];
    return s0 + s1 + s2 + s3;
}

inline float l2sq(const float* a, const float* b, int d) {
    float s = 0.f;
    for (int i = 0; i < d; ++i) {
        float t = a[i] - b[i];
        s += t * t;
    }
    return s;
}

// Packed little-endian bitset test (numpy packbits(bitorder="little")
// layout — the same bytes the TPU tiers' filter masks ship): bit (i & 7)
// of byte (i >> 3) is row i's eligibility.
inline bool bit_test(const uint8_t* bits, int i) {
    return (bits[i >> 3] >> (i & 7)) & 1;
}

// Reusable visited-set: epoch bump instead of an O(n) clear per search.
// One instance per worker thread.
struct Visited {
    std::vector<uint32_t> mark;
    uint32_t epoch = 0;

    void next(size_t n) {
        if (mark.size() < n) mark.resize(n, 0);
        if (++epoch == 0) {  // wrapped: one real clear every 2^32 searches
            std::fill(mark.begin(), mark.end(), 0);
            epoch = 1;
        }
    }
    // returns true if already visited; marks otherwise
    bool test_and_set(int i) {
        if (mark[i] == epoch) return true;
        mark[i] = epoch;
        return false;
    }
};

// ------------------------------------------------------------------ HNSW

struct HNSW {
    int dim;
    int M;               // max neighbours per node (level > 0)
    int M0;              // max neighbours at level 0 (2*M)
    int ef_construction;
    float level_mult;    // 1/ln(M)
    std::vector<float> data;            // n * dim
    std::vector<int> levels;            // per-node top level
    // links[l][node] = neighbour list; flattened per level
    std::vector<std::vector<std::vector<int>>> links;
    int entry = -1;
    int max_level = -1;
    std::mt19937 rng{42};
    // striped per-node link locks (parallel build) + topology lock
    static constexpr int STRIPES = 4096;
    mutable std::unique_ptr<std::mutex[]> locks{new std::mutex[STRIPES]};
    mutable std::mutex topo_mutex;
    Visited seq_vis;  // scratch for the sequential paths

    int size() const { return static_cast<int>(levels.size()); }
    const float* vec(int i) const { return data.data() + (size_t)i * dim; }
    std::mutex& node_lock(int i) const { return locks[i & (STRIPES - 1)]; }

    int random_level() {
        std::uniform_real_distribution<float> u(0.f, 1.f);
        float r = u(rng);
        int lvl = (int)(-std::log(r + 1e-12f) * level_mult);
        return std::min(lvl, 16);
    }

    // greedy descent on one level from start toward q; returns local best
    int greedy(int start, const float* q, int level, bool locked) const {
        int cur = start;
        float cur_score = dot(vec(cur), q, dim);
        bool improved = true;
        std::vector<int> scratch;
        while (improved) {
            improved = false;
            const std::vector<int>* lst = &links[level][cur];
            if (locked) {
                std::lock_guard<std::mutex> g(node_lock(cur));
                scratch = links[level][cur];
                lst = &scratch;
            }
            for (int nb : *lst) {
                float s = dot(vec(nb), q, dim);
                if (s > cur_score) {
                    cur_score = s;
                    cur = nb;
                    improved = true;
                }
            }
        }
        return cur;
    }

    // best-first search on a level; returns top-ef (score, id) ascending.
    // ``allowed`` (nullable packed bitset): disallowed nodes are still
    // TRAVERSED (they navigate the beam — dropping them would disconnect
    // the graph for selective filters) but never enter the result heap;
    // the standard filtered-HNSW discipline (cf. hnswlib isIdAllowed).
    std::vector<std::pair<float, int>> search_level(
        const float* q, int entry_pt, int ef, int level, Visited& vis,
        bool locked, const uint8_t* allowed = nullptr) const {
        std::priority_queue<std::pair<float, int>> candidates;  // max by score
        // results: min-heap by score (keep best ef)
        std::priority_queue<std::pair<float, int>,
                            std::vector<std::pair<float, int>>,
                            std::greater<>> results;
        vis.next(size());
        float e_score = dot(vec(entry_pt), q, dim);
        candidates.emplace(e_score, entry_pt);
        if (!allowed || bit_test(allowed, entry_pt))
            results.emplace(e_score, entry_pt);
        vis.test_and_set(entry_pt);
        std::vector<int> scratch;
        while (!candidates.empty()) {
            auto [c_score, c] = candidates.top();
            candidates.pop();
            if (!results.empty() && c_score < results.top().first &&
                (int)results.size() >= ef)
                break;
            const std::vector<int>* lst = &links[level][c];
            if (locked) {
                std::lock_guard<std::mutex> g(node_lock(c));
                scratch = links[level][c];
                lst = &scratch;
            }
            for (int nb : *lst) {
                if (vis.test_and_set(nb)) continue;
                float s = dot(vec(nb), q, dim);
                if ((int)results.size() < ef || s > results.top().first) {
                    candidates.emplace(s, nb);
                    if (!allowed || bit_test(allowed, nb)) {
                        results.emplace(s, nb);
                        if ((int)results.size() > ef) results.pop();
                    }
                }
            }
        }
        std::vector<std::pair<float, int>> out;
        out.reserve(results.size());
        while (!results.empty()) {
            out.push_back(results.top());
            results.pop();
        }
        return out;  // ascending by score
    }

    // diversity-aware neighbour selection (Malkov Alg. 4, similarity form):
    // scanning candidates best-first, keep e only if it is closer to the
    // node than to every already-kept neighbour; pruned candidates backfill
    // leftover slots (keepPrunedConnections). Plain keep-the-closest-M
    // selection collapses neighbourhoods into one tight cluster and was the
    // measured cause of 0.70 recall@200k in round 1.
    void shrink(std::vector<int>& nbrs, int node, int cap) {
        if ((int)nbrs.size() <= cap) return;
        // score each candidate against the node ONCE — a sort comparator
        // recomputing dots costs O(m log m) dot products and dominated the
        // round-1 build profile
        std::vector<std::pair<float, int>> scored;
        scored.reserve(nbrs.size());
        for (int e : nbrs)
            scored.emplace_back(dot(vec(e), vec(node), dim), e);
        std::sort(scored.begin(), scored.end(),
                  [](const auto& a, const auto& b) { return a.first > b.first; });
        std::vector<int> sel, pruned;
        sel.reserve(cap);
        for (auto& [to_node, e] : scored) {
            if ((int)sel.size() >= cap) break;
            bool diverse = true;
            for (int s : sel)
                if (dot(vec(e), vec(s), dim) > to_node) {
                    diverse = false;
                    break;
                }
            if (diverse) sel.push_back(e);
            else pruned.push_back(e);
        }
        for (int e : pruned) {
            if ((int)sel.size() >= cap) break;
            sel.push_back(e);
        }
        nbrs = std::move(sel);
    }

    // link node ``id`` (vector already stored, level pre-assigned) into the
    // graph; ``locked`` guards link-list access for concurrent inserts.
    // ``min_level``: lowest level to beam-link (kNN-assembled builds pass 1
    // — their level-0 links already exist and stay untouched).
    void insert(int id, int lvl, Visited& vis, bool locked,
                int min_level = 0) {
        const float* v = vec(id);
        int ep, ml;
        {
            std::lock_guard<std::mutex> g(topo_mutex);
            ep = entry;
            ml = max_level;
        }
        int cur = ep;
        for (int l = ml; l > lvl; --l) cur = greedy(cur, v, l, locked);
        // min_level > 0 is the kNN-assembled build: level-0 links already
        // come from exact device k-NN, so the level-0 beam (the expensive
        // part — its graph has ALL nodes) is skipped entirely
        for (int l = std::min(lvl, ml); l >= min_level; --l) {
            auto cand = search_level(v, cur, ef_construction, l, vis, locked);
            int cap = (l == 0) ? M0 : M;
            // run the diversity selection over ALL ef candidates, not just
            // the closest cap of them
            std::vector<int> sel;
            sel.reserve(cand.size());
            for (auto it = cand.rbegin(); it != cand.rend(); ++it)
                sel.push_back(it->second);
            shrink(sel, id, cap);
            {
                std::lock_guard<std::mutex> g(node_lock(id));
                links[l][id] = sel;
            }
            for (int nb : sel) {
                std::lock_guard<std::mutex> g(node_lock(nb));
                links[l][nb].push_back(id);
                shrink(links[l][nb], nb, cap);
            }
            cur = cand.empty() ? cur : cand.back().second;
        }
        {
            std::lock_guard<std::mutex> g(topo_mutex);
            if (lvl > max_level) {
                max_level = lvl;
                entry = id;
            }
        }
    }

    // append nvec vectors; level assignment is sequential (deterministic),
    // graph linking fans out over nthreads workers
    void add_batch(int nvec, const float* vecs, int nthreads) {
        if (nvec <= 0) return;
        int base = size();
        std::vector<int> lvls(nvec);
        int maxl = max_level;
        for (int i = 0; i < nvec; ++i) {
            lvls[i] = random_level();
            maxl = std::max(maxl, lvls[i]);
        }
        data.resize((size_t)(base + nvec) * dim);
        std::memcpy(data.data() + (size_t)base * dim, vecs,
                    sizeof(float) * (size_t)nvec * dim);
        levels.resize(base + nvec);
        std::copy(lvls.begin(), lvls.end(), levels.begin() + base);
        while ((int)links.size() <= maxl) links.emplace_back();
        for (auto& level_links : links) level_links.resize(base + nvec);

        int start = 0;
        if (entry < 0) {  // seed the graph with the first node
            entry = base;
            max_level = lvls[0];
            start = 1;
        }
        if (nthreads <= 0)
            nthreads = (int)std::thread::hardware_concurrency();
        nthreads = std::max(1, std::min(nthreads, nvec - start));
        if (nthreads == 1) {
            for (int i = start; i < nvec; ++i)
                insert(base + i, lvls[i], seq_vis, false);
            return;
        }
        std::atomic<int> next{start};
        auto worker = [&] {
            Visited vis;
            for (;;) {
                int i = next.fetch_add(1);
                if (i >= nvec) break;
                insert(base + i, lvls[i], vis, true);
            }
        };
        std::vector<std::thread> pool;
        pool.reserve(nthreads);
        for (int t = 0; t < nthreads; ++t) pool.emplace_back(worker);
        for (auto& th : pool) th.join();
    }

    void add(const float* v) { add_batch(1, v, 1); }

    // Fresh build from PRECOMPUTED k-NN candidate lists (the accelerator-
    // assisted path: the TPU computes exact/approx k-NN for every corpus
    // row with blocked matmuls — ops/knn.py — replacing this build's only
    // superlinear stage, the per-insertion beam searches). Level-0 links =
    // the same diversity heuristic (shrink) over each node's k-NN
    // candidates + symmetric reverse links; the ~1/M fraction of nodes
    // with level >= 1 is then beam-inserted normally, which (a) builds the
    // navigation hierarchy and (b) merges beam candidates into the hubs'
    // level-0 lists, stitching k-NN cluster components together.
    // Requires an empty index; knn ids are row indices into ``vecs``
    // (self/negatives ignored). Returns 0 on success.
    int build_from_knn(int nvec, const float* vecs, const int* knn_ids,
                       int knn_k, int nthreads) {
        if (size() != 0 || nvec <= 0 || knn_k <= 0) return -1;
        std::vector<int> lvls(nvec);
        int maxl = 0;
        for (int i = 0; i < nvec; ++i) {  // sequential: deterministic
            lvls[i] = random_level();
            maxl = std::max(maxl, lvls[i]);
        }
        data.assign(vecs, vecs + (size_t)nvec * dim);
        levels = lvls;
        links.resize(maxl + 1);
        for (auto& level_links : links) level_links.resize(nvec);

        if (nthreads <= 0)
            nthreads = (int)std::thread::hardware_concurrency();
        nthreads = std::max(1, std::min(nthreads, nvec));
        auto parallel_for = [&](auto body) {
            if (nthreads == 1) {
                for (int i = 0; i < nvec; ++i) body(i);
                return;
            }
            std::atomic<int> next{0};
            auto worker = [&] {
                for (;;) {
                    int i = next.fetch_add(1);
                    if (i >= nvec) break;
                    body(i);
                }
            };
            std::vector<std::thread> pool;
            pool.reserve(nthreads);
            for (int t = 0; t < nthreads; ++t) pool.emplace_back(worker);
            for (auto& th : pool) th.join();
        };

        // 1.+2. level-0 links in ONE batched pass. The round-3 first cut
        //    inserted reverse links one at a time, each insertion re-running
        //    the diversity shrink on the target's saturated list — ~64M
        //    shrinks dominated the 1M assembly (measured ~450 s of ~500 s).
        //    Batched instead: build the exact reverse adjacency (CSR, two
        //    passes over the kNN rows), then shrink each node ONCE over its
        //    forward ∪ reverse candidate set. One writer per node, no
        //    locks, deterministic for every thread count — and the shrink
        //    sees the full candidate set at once, which is a strictly
        //    better input to the diversity heuristic than any insertion
        //    order.
        std::vector<int> indeg(nvec, 0);
        auto row_of = [&](int i) { return knn_ids + (size_t)i * knn_k; };
        auto valid = [&](int i, int e) { return e >= 0 && e < nvec && e != i; };
        for (int i = 0; i < nvec; ++i) {
            const int* row = row_of(i);
            for (int j = 0; j < knn_k; ++j)
                if (valid(i, row[j])) ++indeg[row[j]];
        }
        std::vector<size_t> off(nvec + 1, 0);
        for (int i = 0; i < nvec; ++i) off[i + 1] = off[i] + indeg[i];
        std::vector<int> rev(off[nvec]);
        {
            std::vector<size_t> fill(off.begin(), off.end() - 1);
            for (int i = 0; i < nvec; ++i) {
                const int* row = row_of(i);
                for (int j = 0; j < knn_k; ++j)
                    if (valid(i, row[j])) rev[fill[row[j]]++] = i;
            }
        }
        parallel_for([&](int i) {
            std::vector<int> cand;
            cand.reserve(knn_k + indeg[i]);
            const int* row = row_of(i);
            for (int j = 0; j < knn_k; ++j)
                if (valid(i, row[j])) cand.push_back(row[j]);
            size_t nfw = cand.size();
            for (size_t r = off[i]; r < off[i + 1]; ++r) {
                int e = rev[r];
                // dedup against the (small) forward row only — reverse
                // entries are unique by construction
                bool dup = false;
                for (size_t j = 0; j < nfw; ++j)
                    if (cand[j] == e) { dup = true; break; }
                if (!dup) cand.push_back(e);
            }
            shrink(cand, i, M0);
            links[0][i] = std::move(cand);
        });
        // 3. hierarchy: beam-insert the level>=1 nodes on levels lvl..1
        //    only — their level-0 links already come from exact k-NN, so
        //    the level-0 beams (the expensive part) are skipped entirely
        std::vector<int> upper;
        for (int i = 0; i < nvec; ++i)
            if (lvls[i] >= 1) upper.push_back(i);
        if (upper.empty()) {
            entry = 0;
            max_level = 0;
        } else {
            entry = upper[0];
            max_level = lvls[upper[0]];
            hierarchy_insert_all(upper, lvls, nthreads);
        }

        // 4. navigability guarantee: the level-0 beam explores ONLY
        //    level-0 links, so the level-0 graph itself must be one
        //    component — union-of-levels reachability is NOT enough (a
        //    query descending into a level-0 island gets trapped there
        //    regardless of ef). kNN-derived level-0 links are all
        //    intra-cluster for a tight cluster, so: flood the level-0
        //    graph from the entry; for each unreached component, beam its
        //    representative against the reachable region and add
        //    BIDIRECTIONAL level-0 links (beams can now enter and leave),
        //    promote the representative to level 1 if nothing anchors it
        //    (descent routing), and re-flood. Deterministic, linear, a
        //    no-op when the kNN graph is already connected.
        //    The repair itself can undo itself within a pass: a later
        //    island's escape links may land on a node e holding an earlier
        //    island's forced edge, and the shrink(le, e, M0) on the extra
        //    (added > 0) links can evict that forced edge, silently
        //    re-disconnecting the earlier island. So the whole repair runs
        //    to a FIXPOINT: re-flood from scratch after each pass; pass 0
        //    adds up to M escape links per island (recall-friendly), every
        //    later pass adds ONLY the single forced edge pair with no
        //    shrink anywhere — no pass >= 1 can evict another repair, each
        //    merges >= 1 component, so termination is structural (usually
        //    1 extra confirming pass).
        {
            std::vector<uint8_t> seen(nvec, 0);
            std::vector<int> stack;
            auto flood0 = [&] {
                while (!stack.empty()) {
                    int u = stack.back();
                    stack.pop_back();
                    for (int v : links[0][u])
                        if (v >= 0 && v < nvec && !seen[v]) {
                            seen[v] = 1;
                            stack.push_back(v);
                        }
                }
            };
            for (int pass = 0;; ++pass) {
                std::fill(seen.begin(), seen.end(), 0);
                stack.clear();
                seen[entry] = 1;
                stack.push_back(entry);
                flood0();
                bool all_reached = true;
                for (int i = 0; i < nvec; ++i) {
                    if (seen[i]) continue;
                    all_reached = false;
                    // bidirectional level-0 escape links against the region
                    // the beam can currently reach. The BEST candidate pair
                    // is linked both ways WITHOUT shrink — for a large
                    // island (s > M0 rows) every escape link is the
                    // least-similar entry in a saturated list and the
                    // diversity heuristic would prune all of them on both
                    // sides, silently undoing the guarantee; one forced
                    // edge per side is a bounded overflow (1 per island)
                    // that makes connectivity structural. Remaining
                    // candidates are added best-effort under the normal
                    // capacity rules (pass 0 only — see fixpoint note).
                    auto cand = search_level(vec(i), entry, ef_construction,
                                             0, seq_vis, false);
                    int want = pass == 0 ? M : 1;
                    int added = 0;
                    for (auto it = cand.rbegin();
                         it != cand.rend() && added < want; ++it, ++added) {
                        int e = it->second;
                        if (e == i) continue;
                        auto& li = links[0][i];
                        if (std::find(li.begin(), li.end(), e) == li.end())
                            li.push_back(e);
                        auto& le = links[0][e];
                        if (std::find(le.begin(), le.end(), i) == le.end()) {
                            le.push_back(i);
                            if (added > 0) shrink(le, e, M0);
                        }
                    }
                    if (pass == 0 && (int)links[0][i].size() > M0) {
                        // shrink i's list but re-guarantee the forced edge
                        int anchor = cand.empty() ? -1 : cand.back().second;
                        shrink(links[0][i], i, M0);
                        auto& li = links[0][i];
                        if (anchor >= 0 && anchor != i &&
                            std::find(li.begin(), li.end(), anchor) ==
                                li.end())
                            li.push_back(anchor);
                    }
                    if (levels[i] < 1) {
                        // descent routing: give the island a level-1
                        // presence when it has none (links may not have
                        // the level yet if every random level was 0)
                        if ((int)links.size() < 2) {
                            links.resize(2);
                            links[1].resize(nvec);
                        }
                        if (max_level < 1) {
                            levels[entry] = std::max(levels[entry], 1);
                            insert(entry, 1, seq_vis, false,
                                   /*min_level=*/1);
                        }
                        levels[i] = 1;
                        insert(i, 1, seq_vis, false, /*min_level=*/1);
                    }
                    seen[i] = 1;
                    stack.push_back(i);
                    flood0();
                }
                if (all_reached) break;
            }
        }
        return 0;
    }

    void hierarchy_insert_all(const std::vector<int>& upper,
                              const std::vector<int>& lvls, int nthreads) {
        if (nthreads == 1 || (int)upper.size() < 2) {
            for (size_t u = 1; u < upper.size(); ++u)
                insert(upper[u], lvls[upper[u]], seq_vis, false,
                       /*min_level=*/1);
        } else {
            std::atomic<size_t> next{1};
            int nt = std::min(nthreads, (int)upper.size() - 1);
            auto worker = [&] {
                Visited vis;
                for (;;) {
                    size_t u = next.fetch_add(1);
                    if (u >= upper.size()) break;
                    insert(upper[u], lvls[upper[u]], vis, true,
                           /*min_level=*/1);
                }
            };
            std::vector<std::thread> pool;
            pool.reserve(nt);
            for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
            for (auto& th : pool) th.join();
        }
    }

    void search(const float* q, int k, int ef, int* out_ids,
                float* out_scores, Visited& vis,
                const uint8_t* allowed = nullptr) const {
        if (entry < 0) {
            for (int i = 0; i < k; ++i) {
                out_ids[i] = -1;
                out_scores[i] = -std::numeric_limits<float>::infinity();
            }
            return;
        }
        int cur = entry;
        // upper-level greedy descent is pure navigation — never filtered
        for (int l = max_level; l > 0; --l) cur = greedy(cur, q, l, false);
        auto res =
            search_level(q, cur, std::max(ef, k), 0, vis, false, allowed);
        // res ascending; emit top-k descending
        int n = (int)res.size();
        for (int i = 0; i < k; ++i) {
            int j = n - 1 - i;
            if (j >= 0) {
                out_ids[i] = res[j].second;
                out_scores[i] = res[j].first;
            } else {
                out_ids[i] = -1;
                out_scores[i] = -std::numeric_limits<float>::infinity();
            }
        }
    }
};

// ---------------------------------------------------------------- k-means

void kmeans(const float* data, int n, int d, int k, int iters,
            unsigned seed, float* centroids /* k*d out */) {
    std::mt19937 rng(seed);
    std::uniform_int_distribution<int> pick(0, n - 1);
    for (int c = 0; c < k; ++c)
        std::memcpy(centroids + (size_t)c * d, data + (size_t)pick(rng) * d,
                    sizeof(float) * d);
    std::vector<int> assign(n);
    std::vector<int> counts(k);
    std::vector<double> sums((size_t)k * d);
    for (int it = 0; it < iters; ++it) {
        for (int i = 0; i < n; ++i) {
            float best = std::numeric_limits<float>::max();
            int bc = 0;
            for (int c = 0; c < k; ++c) {
                float dist =
                    l2sq(data + (size_t)i * d, centroids + (size_t)c * d, d);
                if (dist < best) {
                    best = dist;
                    bc = c;
                }
            }
            assign[i] = bc;
        }
        std::fill(counts.begin(), counts.end(), 0);
        std::fill(sums.begin(), sums.end(), 0.0);
        for (int i = 0; i < n; ++i) {
            int c = assign[i];
            counts[c]++;
            for (int j = 0; j < d; ++j)
                sums[(size_t)c * d + j] += data[(size_t)i * d + j];
        }
        for (int c = 0; c < k; ++c) {
            if (counts[c] == 0) {  // re-seed empty cluster
                std::memcpy(centroids + (size_t)c * d,
                            data + (size_t)pick(rng) * d, sizeof(float) * d);
                continue;
            }
            for (int j = 0; j < d; ++j)
                centroids[(size_t)c * d + j] =
                    (float)(sums[(size_t)c * d + j] / counts[c]);
        }
    }
}

// ----------------------------------------------------------------- IVF-PQ

struct IVFPQ {
    int dim, nlist, m, ksub, dsub;
    std::vector<float> coarse;     // nlist * dim
    std::vector<float> codebooks;  // m * ksub * dsub
    std::vector<std::vector<int>> list_ids;           // per list: vector ids
    std::vector<std::vector<uint8_t>> list_codes;     // per list: m bytes/vec
    int count = 0;

    int nearest_list(const float* v) const {
        float best = std::numeric_limits<float>::max();
        int bc = 0;
        for (int c = 0; c < nlist; ++c) {
            float dist = l2sq(v, coarse.data() + (size_t)c * dim, dim);
            if (dist < best) {
                best = dist;
                bc = c;
            }
        }
        return bc;
    }

    void encode(const float* v, const float* centroid, uint8_t* code) const {
        // residual encoding: quantize (v - coarse_centroid) per subspace
        for (int s = 0; s < m; ++s) {
            float best = std::numeric_limits<float>::max();
            int bc = 0;
            const float* cb = codebooks.data() + (size_t)s * ksub * dsub;
            for (int c = 0; c < ksub; ++c) {
                float dist = 0.f;
                for (int j = 0; j < dsub; ++j) {
                    float r = v[s * dsub + j] - centroid[s * dsub + j];
                    float t = r - cb[(size_t)c * dsub + j];
                    dist += t * t;
                }
                if (dist < best) {
                    best = dist;
                    bc = c;
                }
            }
            code[s] = (uint8_t)bc;
        }
    }
};

// --------------------------------------------------------------- WordPiece
// ASCII fast path for WordPiece encode_batch (data/tokenizer.py). The
// device encoder now runs 17-32k sentences/s; the pure-Python tokenizer
// measures ~2.4k/s on this host — the end-to-end bottleneck (ROOFLINE r4).
// The reference outsources this to HF fast tokenizers (Rust,
// utils/chunk_utils.py:114-121 — SURVEY §2.4 item 4 prescribes a C++
// WordPiece). Semantics contract: for PURE-ASCII text this reproduces the
// Python implementation EXACTLY (ASCII never NFD-decomposes, its only Zs
// is space, its controls are caught by the <32/127 ranges, tolower is the
// full lowercase map) — any text containing a non-ASCII byte is left to
// the Python path (ascii_ok[i] = 0), so parity is structural, not
// approximate. Offsets are not produced here; the chunkers keep the
// Python offset-mapped encode().

struct WPVocab {
    // word-initial pieces and ##continuation pieces (## stripped)
    std::unordered_map<std::string, int> full, cont;
    int pad_id, unk_id, cls_id, sep_id;
    int max_word_chars;
    bool lowercase;
};

namespace wp {

inline bool is_ws(unsigned char c) {
    return c == ' ' || c == '\t' || c == '\n' || c == '\r';
}
inline bool is_ctrl(unsigned char c) {
    if (c == '\t' || c == '\n' || c == '\r') return false;
    return c < 32 || c == 127;
}
inline bool is_punct(unsigned char c) {
    return (c >= 33 && c <= 47) || (c >= 58 && c <= 64) ||
           (c >= 91 && c <= 96) || (c >= 123 && c <= 126);
}

// greedy longest-match-first WordPiece of ``word``; appends piece ids to
// ``out``. Returns false if unencodable (caller emits one UNK).
inline bool wordpiece(const WPVocab& v, const std::string& word,
                      std::vector<int>& out) {
    if ((int)word.size() > v.max_word_chars) return false;
    size_t n0 = out.size();
    size_t start = 0;
    while (start < word.size()) {
        size_t end = word.size();
        int id = -1;
        while (start < end) {
            const std::string sub = word.substr(start, end - start);
            const auto& m = start > 0 ? v.cont : v.full;
            auto it = m.find(sub);
            if (it != m.end()) {
                id = it->second;
                break;
            }
            --end;
        }
        if (id < 0) {
            out.resize(n0);
            return false;
        }
        out.push_back(id);
        start = end;
    }
    return true;
}

// offset-mapped variant of the greedy match: emits (id, piece_char_len)
// so the caller can compute original-text spans via the word's
// original-index map (exactly Python encode()'s span arithmetic)
inline bool wordpiece_spans(const WPVocab& v, const std::string& word,
                            std::vector<std::pair<int, int>>& out) {
    if ((int)word.size() > v.max_word_chars) return false;
    size_t n0 = out.size();
    size_t start = 0;
    while (start < word.size()) {
        size_t end = word.size();
        int id = -1;
        while (start < end) {
            const std::string sub = word.substr(start, end - start);
            const auto& m = start > 0 ? v.cont : v.full;
            auto it = m.find(sub);
            if (it != m.end()) {
                id = it->second;
                break;
            }
            --end;
        }
        if (id < 0) {
            out.resize(n0);
            return false;
        }
        out.emplace_back(id, (int)(end - start));
        start = end;
    }
    return true;
}

// offset-mapped single-text encode (the chunkers' contract): token ids +
// [start, end) char spans into the ORIGINAL text. Control chars are
// skipped but their positions preserved via the per-char index map, so
// spans land on original indices exactly like the Python path. Returns
// token count, or -2 when cap is too small (caller grows).
inline int encode_offsets_ascii(const WPVocab& v, const char* s, size_t len,
                                bool add_specials, int max_length,
                                int* ids, int* starts, int* ends, int cap) {
    int n = 0;
    auto push = [&](int id, int st, int en) -> bool {
        if (n >= cap) return false;
        ids[n] = id;
        starts[n] = st;
        ends[n] = en;
        ++n;
        return true;
    };
    if (add_specials && !push(v.cls_id, 0, 0)) return -2;
    const long long budget =
        max_length > 0 ? (long long)max_length - (add_specials ? 2 : 0)
                       : (long long)1 << 60;
    std::string word;
    std::vector<int> idxs;  // original index of each normalized char
    std::vector<std::pair<int, int>> pieces;
    bool open = true, overflow = false;
    auto flush_word = [&]() {
        if (word.empty()) return;
        pieces.clear();
        bool enc = wordpiece_spans(v, word, pieces);
        long long body = n - (add_specials ? 1 : 0);
        long long npieces = enc ? (long long)pieces.size() : 1;
        if (body + npieces > budget) {
            open = false;
            return;
        }
        if (!enc) {
            if (!push(v.unk_id, idxs.front(), idxs.back() + 1))
                overflow = true;
        } else {
            size_t pos = 0;
            for (auto& [id, plen] : pieces) {
                size_t last = std::min(pos + (size_t)plen, word.size()) - 1;
                if (!push(id, idxs[pos], idxs[last] + 1)) {
                    overflow = true;
                    break;
                }
                pos += (size_t)plen;
            }
        }
        word.clear();
        idxs.clear();
    };
    for (size_t i = 0; i < len && open && !overflow; ++i) {
        unsigned char c = (unsigned char)s[i];
        if (c == 0 || is_ctrl(c)) continue;
        if (is_ws(c)) {
            flush_word();
            continue;
        }
        char nc = v.lowercase && c >= 'A' && c <= 'Z' ? (char)(c + 32)
                                                      : (char)c;
        if (is_punct(c)) {
            flush_word();
            if (!open || overflow) break;
            word.assign(1, nc);
            idxs.assign(1, (int)i);
            flush_word();
            continue;
        }
        word.push_back(nc);
        idxs.push_back((int)i);
    }
    if (open && !overflow) flush_word();
    if (add_specials && !overflow)
        overflow = !push(v.sep_id, (int)len, (int)len);
    return overflow ? -2 : n;
}

// encode one ASCII text: [CLS] + body (whole-word truncation at
// max_length-2, mirroring Python's break-on-budget) + [SEP]
inline int encode_ascii(const WPVocab& v, const char* s, size_t len,
                        int max_length, int* ids, int* mask) {
    std::vector<int> toks;
    toks.reserve(max_length);
    toks.push_back(v.cls_id);
    const int budget = max_length - 2;
    std::string word;
    std::vector<int> pieces;
    auto flush_word = [&]() -> bool {  // false = budget hit, stop
        if (word.empty()) return true;
        pieces.clear();
        if (!wordpiece(v, word, pieces)) {
            pieces.assign(1, v.unk_id);
        }
        if ((int)(toks.size() - 1 + pieces.size()) > budget) return false;
        toks.insert(toks.end(), pieces.begin(), pieces.end());
        word.clear();
        return true;
    };
    bool open = true;
    for (size_t i = 0; i < len && open; ++i) {
        unsigned char c = (unsigned char)s[i];
        if (c == 0 || is_ctrl(c)) continue;
        if (is_ws(c)) {
            open = flush_word();
            if (open) word.clear();
            continue;
        }
        char nc = v.lowercase && c >= 'A' && c <= 'Z' ? (char)(c + 32)
                                                      : (char)c;
        if (is_punct(c)) {
            open = flush_word();
            if (!open) break;
            word.assign(1, nc);
            open = flush_word();
            if (open) word.clear();
            continue;
        }
        word.push_back(nc);
    }
    if (open) flush_word();
    toks.push_back(v.sep_id);
    int n = (int)toks.size();
    for (int i = 0; i < n; ++i) {
        ids[i] = toks[i];
        mask[i] = 1;
    }
    return n;
}

}  // namespace wp

}  // namespace

// ------------------------------------------------------------- C ABI layer

extern "C" {

// bump whenever any exported signature or on-disk format changes; the
// ctypes wrapper refuses to run against a mismatched build
int latentrag_abi_version(void) { return 7; }

// --- WordPiece fast path ------------------------------------------------

// vocab_blob: concatenated utf-8 tokens; offs: n_tokens+1 byte offsets.
// Token index == vocab id (the Python vocab dict is id-dense).
void* wp_create(const char* vocab_blob, const long long* offs, int n_tokens,
                int pad_id, int unk_id, int cls_id, int sep_id,
                int lowercase, int max_word_chars) {
    auto* v = new WPVocab();
    v->pad_id = pad_id;
    v->unk_id = unk_id;
    v->cls_id = cls_id;
    v->sep_id = sep_id;
    v->lowercase = lowercase != 0;
    v->max_word_chars = max_word_chars;
    v->full.reserve((size_t)n_tokens);
    for (int i = 0; i < n_tokens; ++i) {
        const char* b = vocab_blob + offs[i];
        size_t len = (size_t)(offs[i + 1] - offs[i]);
        if (len >= 2 && b[0] == '#' && b[1] == '#') {
            if (len > 2) v->cont.emplace(std::string(b + 2, len - 2), i);
        } else if (len > 0) {
            v->full.emplace(std::string(b, len), i);
        }
    }
    return v;
}

void wp_free(void* p) { delete static_cast<WPVocab*>(p); }

// offset-mapped single-text encode (the chunkers' path). Returns the
// token count; -1 = text contains non-ASCII bytes (caller uses the
// Python path); -2 = cap too small (caller grows and retries).
int wp_encode_offsets(void* p, const char* s, long long len,
                      int add_specials, int max_length, int* out_ids,
                      int* out_starts, int* out_ends, int cap) {
    auto* v = static_cast<WPVocab*>(p);
    for (long long j = 0; j < len; ++j)
        if ((unsigned char)s[j] >= 0x80) return -1;
    return wp::encode_offsets_ascii(*v, s, (size_t)len, add_specials != 0,
                                    max_length, out_ids, out_starts,
                                    out_ends, cap);
}

// texts: blob + n_texts+1 byte offsets. out_ids/out_mask: [n_texts *
// max_length], caller-prefilled with pad_id / 0. ascii_ok[i] is set to 1
// when row i was encoded here, 0 when the text contains a non-ASCII byte
// (caller falls back to the Python path for that row).
// CONTRACT: max_length (the row stride) must be >= 2 — CLS+SEP always
// emit, so a 1-wide row would overrun into its neighbour. The Python
// wrapper allocates max(max_length, 2) and slices afterwards.
void wp_encode_batch(void* p, const char* blob, const long long* offs,
                     int n_texts, int max_length, int* out_ids,
                     int* out_mask, unsigned char* ascii_ok, int nthreads) {
    auto* v = static_cast<WPVocab*>(p);
    auto body = [&](int i) {
        const char* s = blob + offs[i];
        size_t len = (size_t)(offs[i + 1] - offs[i]);
        for (size_t j = 0; j < len; ++j) {
            if ((unsigned char)s[j] >= 0x80) {
                ascii_ok[i] = 0;
                return;
            }
        }
        ascii_ok[i] = 1;
        wp::encode_ascii(*v, s, len, max_length,
                         out_ids + (size_t)i * max_length,
                         out_mask + (size_t)i * max_length);
    };
    if (nthreads <= 1 || n_texts < 64) {
        for (int i = 0; i < n_texts; ++i) body(i);
        return;
    }
    std::atomic<int> next{0};
    auto worker = [&] {
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= n_texts) break;
            body(i);
        }
    };
    std::vector<std::thread> pool;
    int nt = std::min(nthreads, n_texts);
    pool.reserve(nt);
    for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
}

void* hnsw_new(int dim, int M, int ef_construction, unsigned seed) {
    auto* h = new HNSW();
    h->dim = dim;
    h->M = M;
    h->M0 = 2 * M;
    h->ef_construction = ef_construction;
    h->level_mult = 1.0f / std::log((float)M);
    h->rng.seed(seed);
    return h;
}

void hnsw_free(void* p) { delete static_cast<HNSW*>(p); }

int hnsw_size(void* p) { return static_cast<HNSW*>(p)->size(); }

void hnsw_add_batch(void* p, int n, const float* data, int nthreads) {
    static_cast<HNSW*>(p)->add_batch(n, data, nthreads);
}

int hnsw_build_knn(void* p, int n, const float* data, const int* knn_ids,
                   int knn_k, int nthreads) {
    return static_cast<HNSW*>(p)->build_from_knn(n, data, knn_ids, knn_k,
                                                 nthreads);
}

static void hnsw_search_impl(HNSW* h, int nq, const float* queries, int k,
                             int ef, const uint8_t* allowed, int* out_ids,
                             float* out_scores, int nthreads) {
    if (nthreads <= 0) nthreads = (int)std::thread::hardware_concurrency();
    nthreads = std::max(1, std::min(nthreads, nq));
    if (nthreads == 1) {
        Visited vis;
        for (int i = 0; i < nq; ++i)
            h->search(queries + (size_t)i * h->dim, k, ef,
                      out_ids + (size_t)i * k, out_scores + (size_t)i * k,
                      vis, allowed);
        return;
    }
    std::atomic<int> next{0};
    auto worker = [&] {
        Visited vis;
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= nq) break;
            h->search(queries + (size_t)i * h->dim, k, ef,
                      out_ids + (size_t)i * k, out_scores + (size_t)i * k,
                      vis, allowed);
        }
    };
    std::vector<std::thread> pool;
    pool.reserve(nthreads);
    for (int t = 0; t < nthreads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
}

void hnsw_search_batch(void* p, int nq, const float* queries, int k, int ef,
                       int* out_ids, float* out_scores, int nthreads) {
    hnsw_search_impl(static_cast<HNSW*>(p), nq, queries, k, ef, nullptr,
                     out_ids, out_scores, nthreads);
}

// Filtered variant: ``allowed`` is a packed little-endian bitset over the
// index's vector ids (>= ceil(size/8) bytes — numpy packbits layout, the
// same mask bytes the TPU tiers consume). Disallowed nodes still steer
// the beam but never enter results; unreachable k slots emit -1/-inf.
void hnsw_search_batch_filtered(void* p, int nq, const float* queries,
                                int k, int ef, const uint8_t* allowed,
                                int* out_ids, float* out_scores,
                                int nthreads) {
    hnsw_search_impl(static_cast<HNSW*>(p), nq, queries, k, ef, allowed,
                     out_ids, out_scores, nthreads);
}

int hnsw_save(void* p, const char* path) {
    auto* h = static_cast<HNSW*>(p);
    FILE* f = std::fopen(path, "wb");
    if (!f) return -1;
    int n = h->size();
    int nlevels = (int)h->links.size();
    std::fwrite(&h->dim, 4, 1, f);
    std::fwrite(&h->M, 4, 1, f);
    std::fwrite(&h->ef_construction, 4, 1, f);
    std::fwrite(&n, 4, 1, f);
    std::fwrite(&h->entry, 4, 1, f);
    std::fwrite(&h->max_level, 4, 1, f);
    std::fwrite(&nlevels, 4, 1, f);
    std::fwrite(h->data.data(), 4, (size_t)n * h->dim, f);
    std::fwrite(h->levels.data(), 4, n, f);
    for (auto& level : h->links)
        for (int i = 0; i < n; ++i) {
            int sz = i < (int)level.size() ? (int)level[i].size() : 0;
            std::fwrite(&sz, 4, 1, f);
            if (sz) std::fwrite(level[i].data(), 4, sz, f);
        }
    std::fclose(f);
    return 0;
}

void* hnsw_load(const char* path) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return nullptr;
    auto* h = new HNSW();
    int n = 0, nlevels = 0;
    bool ok = std::fread(&h->dim, 4, 1, f) == 1 &&
              std::fread(&h->M, 4, 1, f) == 1 &&
              std::fread(&h->ef_construction, 4, 1, f) == 1 &&
              std::fread(&n, 4, 1, f) == 1 &&
              std::fread(&h->entry, 4, 1, f) == 1 &&
              std::fread(&h->max_level, 4, 1, f) == 1 &&
              std::fread(&nlevels, 4, 1, f) == 1;
    // reject corrupt headers before they drive a wild allocation
    // (n*dim overflow / absurd sizes), an inf/NaN level_mult (M<=1), or an
    // OOB entry walk; the payload must actually fit in the file
    long here = std::ftell(f);
    std::fseek(f, 0, SEEK_END);
    long fsize = std::ftell(f);
    std::fseek(f, here, SEEK_SET);
    bool header_sane =
        ok && n >= 0 && nlevels >= 0 && nlevels <= 64 &&
        h->dim > 0 && h->dim <= (1 << 20) && h->M > 1 &&
        h->ef_construction >= 0 &&
        (size_t)n <= SIZE_MAX / 4 / (size_t)h->dim &&
        h->entry >= -1 && h->entry < (n > 0 ? n : 1) &&
        h->max_level >= -1 && h->max_level < (nlevels > 0 ? nlevels : 1);
    if (header_sane) {
        // minimum payload: vectors + per-node levels + one size word per
        // (level, node) neighbour list
        size_t need = (size_t)n * h->dim * 4 + (size_t)n * 4 +
                      (size_t)nlevels * (size_t)n * 4;
        header_sane = fsize >= 0 && (size_t)(fsize - here) >= need;
    }
    if (!header_sane) {
        std::fclose(f);
        delete h;
        return nullptr;
    }
    h->M0 = 2 * h->M;
    h->level_mult = 1.0f / std::log((float)h->M);
    h->data.resize((size_t)n * h->dim);
    h->levels.resize(n);
    ok = std::fread(h->data.data(), 4, (size_t)n * h->dim, f) ==
             (size_t)n * h->dim &&
         std::fread(h->levels.data(), 4, n, f) == (size_t)n;
    h->links.resize(nlevels);
    for (auto& level : h->links) {
        level.resize(n);
        for (int i = 0; i < n && ok; ++i) {
            int sz = 0;
            ok = std::fread(&sz, 4, 1, f) == 1 && sz >= 0 && sz <= n;
            if (ok && sz) {
                level[i].resize(sz);
                ok = std::fread(level[i].data(), 4, sz, f) == (size_t)sz;
                // neighbour ids index data[]/visited[] directly — a corrupt
                // id is an OOB read/write at search time, reject here
                for (int nb : level[i])
                    if (nb < 0 || nb >= n) {
                        ok = false;
                        break;
                    }
            }
        }
    }
    std::fclose(f);
    if (!ok) {
        delete h;
        return nullptr;
    }
    return h;
}

void kmeans_train(const float* data, int n, int d, int k, int iters,
                  unsigned seed, float* out_centroids) {
    kmeans(data, n, d, k, iters, seed, out_centroids);
}

void* ivfpq_new(int dim, int nlist, int m, int nbits) {
    auto* ix = new IVFPQ();
    ix->dim = dim;
    ix->nlist = nlist;
    ix->m = m;
    ix->ksub = 1 << nbits;
    ix->dsub = dim / m;
    ix->coarse.resize((size_t)nlist * dim);
    ix->codebooks.resize((size_t)m * ix->ksub * ix->dsub);
    ix->list_ids.resize(nlist);
    ix->list_codes.resize(nlist);
    return ix;
}

void ivfpq_free(void* p) { delete static_cast<IVFPQ*>(p); }

void ivfpq_train(void* p, const float* data, int n, int iters,
                 unsigned seed) {
    auto* ix = static_cast<IVFPQ*>(p);
    kmeans(data, n, ix->dim, ix->nlist, iters, seed, ix->coarse.data());
    // residuals for PQ training
    std::vector<float> resid((size_t)n * ix->dim);
    for (int i = 0; i < n; ++i) {
        int c = ix->nearest_list(data + (size_t)i * ix->dim);
        const float* cent = ix->coarse.data() + (size_t)c * ix->dim;
        for (int j = 0; j < ix->dim; ++j)
            resid[(size_t)i * ix->dim + j] =
                data[(size_t)i * ix->dim + j] - cent[j];
    }
    // per-subspace codebooks
    std::vector<float> sub((size_t)n * ix->dsub);
    for (int s = 0; s < ix->m; ++s) {
        for (int i = 0; i < n; ++i)
            std::memcpy(sub.data() + (size_t)i * ix->dsub,
                        resid.data() + (size_t)i * ix->dim + s * ix->dsub,
                        sizeof(float) * ix->dsub);
        kmeans(sub.data(), n, ix->dsub, ix->ksub, iters, seed + s + 1,
               ix->codebooks.data() + (size_t)s * ix->ksub * ix->dsub);
    }
}

// Load externally-trained parameters (the TPU-assisted build:
// ops/kmeans.py trains coarse centroids + PQ codebooks on device with the
// same L2/residual semantics, then serves from this C++ tier).
// coarse: nlist*dim floats; codebooks: m*ksub*dsub floats.
void ivfpq_set_trained(void* p, const float* coarse,
                       const float* codebooks) {
    auto* ix = static_cast<IVFPQ*>(p);
    std::memcpy(ix->coarse.data(), coarse,
                sizeof(float) * ix->coarse.size());
    std::memcpy(ix->codebooks.data(), codebooks,
                sizeof(float) * ix->codebooks.size());
}

// Append vectors whose list assignment + PQ codes were computed
// externally (device encode): assigns[n] list ids, codes[n*m] bytes.
// Linear host work — no distance computation at all.
int ivfpq_add_encoded(void* p, const int* assigns, const uint8_t* codes,
                      int n) {
    auto* ix = static_cast<IVFPQ*>(p);
    // validate every list id BEFORE mutating anything — failing mid-loop
    // would leave earlier rows appended while count stays unchanged, and a
    // retry would then hand out duplicate ids
    for (int i = 0; i < n; ++i)
        if (assigns[i] < 0 || assigns[i] >= ix->nlist) return -1;
    for (int i = 0; i < n; ++i) {
        int c = assigns[i];
        ix->list_ids[c].push_back(ix->count + i);
        ix->list_codes[c].insert(ix->list_codes[c].end(),
                                 codes + (size_t)i * ix->m,
                                 codes + (size_t)(i + 1) * ix->m);
    }
    ix->count += n;
    return 0;
}

void ivfpq_add(void* p, const float* data, int n) {
    auto* ix = static_cast<IVFPQ*>(p);
    std::vector<uint8_t> code(ix->m);
    for (int i = 0; i < n; ++i) {
        const float* v = data + (size_t)i * ix->dim;
        int c = ix->nearest_list(v);
        ix->encode(v, ix->coarse.data() + (size_t)c * ix->dim, code.data());
        ix->list_ids[c].push_back(ix->count + i);
        ix->list_codes[c].insert(ix->list_codes[c].end(), code.begin(),
                                 code.end());
    }
    ix->count += n;
}

// Persistence (FAISS write_index/read_index parity for the IVF-PQ tier):
// header (magic, dim, nlist, m, ksub, count) + coarse + codebooks +
// per-list (size, ids, codes). Same corrupt-header discipline as
// hnsw_load: validate sizes against the file before any allocation.
static const int IVFPQ_MAGIC = 0x49565051;  // "IVPQ"

int ivfpq_save(void* p, const char* path) {
    auto* ix = static_cast<IVFPQ*>(p);
    FILE* f = std::fopen(path, "wb");
    if (!f) return -1;
    std::fwrite(&IVFPQ_MAGIC, 4, 1, f);
    std::fwrite(&ix->dim, 4, 1, f);
    std::fwrite(&ix->nlist, 4, 1, f);
    std::fwrite(&ix->m, 4, 1, f);
    std::fwrite(&ix->ksub, 4, 1, f);
    std::fwrite(&ix->count, 4, 1, f);
    std::fwrite(ix->coarse.data(), 4, ix->coarse.size(), f);
    std::fwrite(ix->codebooks.data(), 4, ix->codebooks.size(), f);
    for (int c = 0; c < ix->nlist; ++c) {
        int sz = (int)ix->list_ids[c].size();
        std::fwrite(&sz, 4, 1, f);
        if (sz) {
            std::fwrite(ix->list_ids[c].data(), 4, sz, f);
            std::fwrite(ix->list_codes[c].data(), 1,
                        (size_t)sz * ix->m, f);
        }
    }
    std::fclose(f);
    return 0;
}

void* ivfpq_load(const char* path) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return nullptr;
    int magic = 0, dim = 0, nlist = 0, m = 0, ksub = 0, count = 0;
    bool ok = std::fread(&magic, 4, 1, f) == 1 &&
              std::fread(&dim, 4, 1, f) == 1 &&
              std::fread(&nlist, 4, 1, f) == 1 &&
              std::fread(&m, 4, 1, f) == 1 &&
              std::fread(&ksub, 4, 1, f) == 1 &&
              std::fread(&count, 4, 1, f) == 1;
    long here = std::ftell(f);
    std::fseek(f, 0, SEEK_END);
    long fsize = std::ftell(f);
    std::fseek(f, here, SEEK_SET);
    ok = ok && magic == IVFPQ_MAGIC && dim > 0 && dim <= (1 << 20) &&
         m > 0 && m <= dim && dim % m == 0 && ksub > 0 && ksub <= 256 &&
         nlist > 0 && nlist <= (1 << 24) && count >= 0;
    if (ok) {
        size_t need = (size_t)nlist * dim * 4 +
                      (size_t)m * ksub * (dim / m) * 4 +
                      (size_t)nlist * 4 + (size_t)count * (4 + m);
        ok = fsize >= 0 && (size_t)(fsize - here) >= need;
    }
    if (!ok) {
        std::fclose(f);
        return nullptr;
    }
    auto* ix = new IVFPQ();
    ix->dim = dim;
    ix->nlist = nlist;
    ix->m = m;
    ix->ksub = ksub;
    ix->dsub = dim / m;
    ix->count = count;
    ix->coarse.resize((size_t)nlist * dim);
    ix->codebooks.resize((size_t)m * ksub * ix->dsub);
    ix->list_ids.resize(nlist);
    ix->list_codes.resize(nlist);
    ok = std::fread(ix->coarse.data(), 4, ix->coarse.size(), f) ==
             ix->coarse.size() &&
         std::fread(ix->codebooks.data(), 4, ix->codebooks.size(), f) ==
             ix->codebooks.size();
    long total = 0;
    for (int c = 0; ok && c < nlist; ++c) {
        int sz = 0;
        ok = std::fread(&sz, 4, 1, f) == 1 && sz >= 0 &&
             (total += sz) <= count;
        if (!ok || !sz) continue;
        ix->list_ids[c].resize(sz);
        ix->list_codes[c].resize((size_t)sz * m);
        ok = std::fread(ix->list_ids[c].data(), 4, sz, f) == (size_t)sz &&
             std::fread(ix->list_codes[c].data(), 1, (size_t)sz * m, f) ==
                 (size_t)sz * m;
    }
    std::fclose(f);
    if (!ok || total != count) {
        delete ix;
        return nullptr;
    }
    return ix;
}

// out5 = {dim, nlist, m, ksub, count}
void ivfpq_params(void* p, int* out5) {
    auto* ix = static_cast<IVFPQ*>(p);
    out5[0] = ix->dim;
    out5[1] = ix->nlist;
    out5[2] = ix->m;
    out5[3] = ix->ksub;
    out5[4] = ix->count;
}

static void ivfpq_search_impl(IVFPQ* ix, const float* queries, int nq,
                              int k, int nprobe, const uint8_t* allowed,
                              int* out_ids, float* out_scores) {
    int m = ix->m, dsub = ix->dsub, ksub = ix->ksub;
    std::vector<std::pair<float, int>> list_order(ix->nlist);
    std::vector<float> lut((size_t)m * ksub);
    for (int qi = 0; qi < nq; ++qi) {
        const float* q = queries + (size_t)qi * ix->dim;
        for (int c = 0; c < ix->nlist; ++c)
            list_order[c] = {
                l2sq(q, ix->coarse.data() + (size_t)c * ix->dim, ix->dim), c};
        int np = std::min(nprobe, ix->nlist);
        std::partial_sort(list_order.begin(), list_order.begin() + np,
                          list_order.end());
        // min-heap over negative-distance scores, keep k best
        std::priority_queue<std::pair<float, int>,
                            std::vector<std::pair<float, int>>,
                            std::greater<>> best;
        for (int pi = 0; pi < np; ++pi) {
            int c = list_order[pi].second;
            const float* cent = ix->coarse.data() + (size_t)c * ix->dim;
            // ADC lookup table for residual distances in this list
            for (int s = 0; s < m; ++s) {
                const float* cb =
                    ix->codebooks.data() + (size_t)s * ksub * dsub;
                for (int cc = 0; cc < ksub; ++cc) {
                    float dist = 0.f;
                    for (int j = 0; j < dsub; ++j) {
                        float r = q[s * dsub + j] - cent[s * dsub + j];
                        float t = r - cb[(size_t)cc * dsub + j];
                        dist += t * t;
                    }
                    lut[(size_t)s * ksub + cc] = dist;
                }
            }
            const auto& ids = ix->list_ids[c];
            const auto& codes = ix->list_codes[c];
            for (size_t i = 0; i < ids.size(); ++i) {
                if (allowed && !bit_test(allowed, ids[i])) continue;
                float dist = 0.f;
                const uint8_t* code = codes.data() + i * m;
                for (int s = 0; s < m; ++s)
                    dist += lut[(size_t)s * ksub + code[s]];
                float score = -dist;
                if ((int)best.size() < k || score > best.top().first) {
                    best.emplace(score, ids[i]);
                    if ((int)best.size() > k) best.pop();
                }
            }
        }
        std::vector<std::pair<float, int>> res;
        while (!best.empty()) {
            res.push_back(best.top());
            best.pop();
        }
        for (int i = 0; i < k; ++i) {
            int j = (int)res.size() - 1 - i;
            if (j >= 0) {
                out_ids[(size_t)qi * k + i] = res[j].second;
                out_scores[(size_t)qi * k + i] = res[j].first;
            } else {
                out_ids[(size_t)qi * k + i] = -1;
                out_scores[(size_t)qi * k + i] =
                    -std::numeric_limits<float>::infinity();
            }
        }
    }
}

void ivfpq_search(void* p, const float* queries, int nq, int k, int nprobe,
                  int* out_ids, float* out_scores) {
    ivfpq_search_impl(static_cast<IVFPQ*>(p), queries, nq, k, nprobe,
                      nullptr, out_ids, out_scores);
}

// Filtered variant (same packed-bitset contract as
// hnsw_search_batch_filtered): disallowed ids are skipped during the
// inverted-list scan, so the heap only ever holds eligible vectors.
void ivfpq_search_filtered(void* p, const float* queries, int nq, int k,
                           int nprobe, const uint8_t* allowed, int* out_ids,
                           float* out_scores) {
    ivfpq_search_impl(static_cast<IVFPQ*>(p), queries, nq, k, nprobe,
                      allowed, out_ids, out_scores);
}

}  // extern "C"
