// ThreadSanitizer harness for the threaded native paths (`make tsan`).
//
// Exercises, with 8 worker threads on synthetic data:
//   1. concurrent HNSW insert beams (add_batch, striped node locks);
//   2. the batched build_from_knn level-0 assembly (one writer per node);
//   3. concurrent read-only searches against the built graph;
//   4. concurrent searches against one index WHILE another index
//      batch-inserts (distinct indexes may run concurrently; search
//      overlapping add_batch on the SAME index is outside the library's
//      contract — add_batch resizes the vector store, invalidating
//      reader pointers, and TSAN correctly flags it; serving layers
//      serialize add vs search per index, as serve.py's request loop
//      does);
//   5. the threaded WordPiece batch encode (disjoint output rows).
//
// Exit code 0 with no TSAN report = clean. Run via the Makefile target
// (TSAN_OPTIONS=halt_on_error=1 makes any race fatal).

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <string>
#include <thread>
#include <vector>

extern "C" {
int latentrag_abi_version(void);
void* hnsw_new(int dim, int M, int ef_construction, unsigned seed);
void hnsw_free(void* p);
int hnsw_size(void* p);
void hnsw_add_batch(void* p, int n, const float* data, int nthreads);
int hnsw_build_knn(void* p, int n, const float* data, const int* knn_ids,
                   int knn_k, int nthreads);
void hnsw_search_batch(void* p, int nq, const float* queries, int k, int ef,
                       int* out_ids, float* out_scores, int nthreads);
void* wp_create(const char* vocab_blob, const long long* offs, int n_tokens,
                int pad_id, int unk_id, int cls_id, int sep_id,
                int lowercase, int max_word_chars);
void wp_free(void* p);
void wp_encode_batch(void* p, const char* blob, const long long* offs,
                     int n_texts, int max_length, int* out_ids,
                     int* out_mask, unsigned char* ascii_ok, int nthreads);
}

static std::vector<float> random_unit(int n, int d, unsigned seed) {
    std::mt19937 rng(seed);
    std::normal_distribution<float> g;
    std::vector<float> v((size_t)n * d);
    for (int i = 0; i < n; ++i) {
        float s = 0.f;
        for (int j = 0; j < d; ++j) {
            v[(size_t)i * d + j] = g(rng);
            s += v[(size_t)i * d + j] * v[(size_t)i * d + j];
        }
        s = 1.0f / std::sqrt(s + 1e-12f);
        for (int j = 0; j < d; ++j) v[(size_t)i * d + j] *= s;
    }
    return v;
}

int main() {
    const int NT = 8, D = 16, N = 1500, K = 8;
    std::printf("[tsan] abi=%d\n", latentrag_abi_version());

    // 1. concurrent insert beams
    auto data = random_unit(N, D, 0);
    void* h1 = hnsw_new(D, 8, 40, 42);
    hnsw_add_batch(h1, N, data.data(), NT);
    if (hnsw_size(h1) != N) return 2;

    // 3. + 4. concurrent searches on h1 while a SEPARATE index builds
    auto queries = random_unit(64, D, 1);
    std::vector<int> ids(64 * K);
    std::vector<float> scores(64 * K);
    hnsw_search_batch(h1, 64, queries.data(), K, 32, ids.data(),
                      scores.data(), NT);
    auto extra = random_unit(300, D, 2);
    void* hb = hnsw_new(D, 8, 40, 7);
    std::thread writer(
        [&] { hnsw_add_batch(hb, 300, extra.data(), 2); });
    for (int r = 0; r < 4; ++r)
        hnsw_search_batch(h1, 64, queries.data(), K, 32, ids.data(),
                          scores.data(), 4);
    writer.join();
    if (hnsw_size(hb) != 300) return 3;
    hnsw_free(hb);
    hnsw_free(h1);
    std::printf("[tsan] hnsw insert/search/parallel-index ok\n");

    // 2. batched kNN assembly (exact brute-force kNN lists)
    std::vector<int> knn((size_t)N * K);
    for (int i = 0; i < N; ++i) {
        std::vector<std::pair<float, int>> best;
        for (int j = 0; j < N; ++j) {
            if (j == i) continue;
            float s = 0.f;
            for (int d2 = 0; d2 < D; ++d2)
                s += data[(size_t)i * D + d2] * data[(size_t)j * D + d2];
            best.emplace_back(-s, j);
        }
        std::partial_sort(best.begin(), best.begin() + K, best.end());
        for (int k2 = 0; k2 < K; ++k2) knn[(size_t)i * K + k2] = best[k2].second;
    }
    void* h2 = hnsw_new(D, 8, 40, 42);
    if (hnsw_build_knn(h2, N, data.data(), knn.data(), K, NT) != 0) return 4;
    hnsw_search_batch(h2, 64, queries.data(), K, 32, ids.data(),
                      scores.data(), NT);
    hnsw_free(h2);
    std::printf("[tsan] build_from_knn assembly ok\n");

    // 5. threaded WordPiece batch encode
    std::string vb;
    std::vector<long long> voffs{0};
    auto add_tok = [&](const std::string& t) {
        vb += t;
        voffs.push_back((long long)vb.size());
    };
    for (const char* t : {"[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"})
        add_tok(t);
    for (char c = 'a'; c <= 'z'; ++c) {
        add_tok(std::string(1, c));
        add_tok("##" + std::string(1, c));
    }
    void* wp = wp_create(vb.data(), voffs.data(), (int)voffs.size() - 1,
                         0, 1, 2, 3, 1, 100);
    const int NTXT = 512, ML = 32;
    std::string blob;
    std::vector<long long> toffs{0};
    for (int i = 0; i < NTXT; ++i) {
        blob += "the quick brown fox number " + std::to_string(i);
        toffs.push_back((long long)blob.size());
    }
    std::vector<int> oids(NTXT * ML, 0), omask(NTXT * ML, 0);
    std::vector<unsigned char> ok(NTXT, 0);
    wp_encode_batch(wp, blob.data(), toffs.data(), NTXT, ML, oids.data(),
                    omask.data(), ok.data(), NT);
    for (int i = 0; i < NTXT; ++i)
        if (!ok[i] || oids[(size_t)i * ML] != 2) return 5;
    wp_free(wp);
    std::printf("[tsan] threaded wordpiece ok\n");

    std::printf("[tsan] all clean\n");
    return 0;
}
