// Reference-architecture CPU Vamana baseline (measured anchor for
// BASELINE.md / bench.py's vs_baseline).
//
// The reference (intel/ScalableVectorSearch) could not be built in this
// sandbox: its CMake FetchContent dependencies (eve, fmt, robin-map,
// spdlog, toml++) need network access and the build host has zero egress
// (see BASELINE.md for the recorded attempt).  This file is a faithful
// same-ARCHITECTURE stand-in measured on the same host instead: the
// pointer-chasing single-query greedy beam search of
// include/svs/index/vamana/greedy_search.h:124-203 (sorted search buffer,
// visited set, neighbor prefetch) and the incremental insert + RobustPrune
// build of include/svs/index/vamana/vamana_build.h:221-579, in plain C++
// compiled -O3 -march=native (AVX-512 on this host) — deliberately SIMPLER
// than SVS's hand-tuned eve kernels, so its measured QPS UNDERSTATES the
// real baseline; BASELINE.md applies an explicit kernel-quality margin on
// top of the single-core -> 48-core linear scaling bound.
//
// Binary formats (little-endian):
//   data/queries: int32 n, int32 dim, n*dim float32 row-major
//   graph:        int32 n, int32 R,  n*R  int32 (-1 padded)
//   gt:           int32 n, int32 k,  n*k  int32
//
// Usage:
//   vamana_cpu build  <data.bin> <graph.out> <R> <L> <alpha>
//   vamana_cpu search <data.bin> <graph.bin> <queries.bin> <gt.bin> <k> \
//                     <w1,w2,...>

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <numeric>
#include <random>
#include <string>
#include <vector>

static double now_s() {
    using namespace std::chrono;
    return duration<double>(steady_clock::now().time_since_epoch()).count();
}

struct Matrix {
    int32_t n = 0, d = 0;
    std::vector<float> v;
    const float* row(int32_t i) const { return v.data() + (size_t)i * d; }
};

struct IntMatrix {
    int32_t n = 0, d = 0;
    std::vector<int32_t> v;
    const int32_t* row(int32_t i) const { return v.data() + (size_t)i * d; }
    int32_t* row(int32_t i) { return v.data() + (size_t)i * d; }
};

template <typename M>
static M load_bin(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(1); }
    M m;
    if (fread(&m.n, 4, 1, f) != 1 || fread(&m.d, 4, 1, f) != 1) {
        fprintf(stderr, "bad header in %s\n", path); exit(1);
    }
    m.v.resize((size_t)m.n * m.d);
    if (fread(m.v.data(), sizeof(m.v[0]), m.v.size(), f) != m.v.size()) {
        fprintf(stderr, "short read in %s\n", path); exit(1);
    }
    fclose(f);
    return m;
}

static void save_graph(const char* path, const IntMatrix& g) {
    FILE* f = fopen(path, "wb");
    if (!f) { fprintf(stderr, "cannot write %s\n", path); exit(1); }
    fwrite(&g.n, 4, 1, f);
    fwrite(&g.d, 4, 1, f);
    fwrite(g.v.data(), sizeof(g.v[0]), g.v.size(), f);
    fclose(f);
}

static inline float l2(const float* a, const float* b, int d) {
    float acc = 0.f;
#pragma omp simd reduction(+ : acc)
    for (int i = 0; i < d; ++i) {
        float t = a[i] - b[i];
        acc += t * t;
    }
    return acc;
}

// Sorted fixed-capacity search buffer, greedy_search.h's SearchBuffer:
// ascending by distance, linear-shift insert (W is small), per-slot
// expanded flag.
struct Beam {
    std::vector<float> dist;
    std::vector<int32_t> id;
    std::vector<uint8_t> expanded;
    int size = 0, cap;
    explicit Beam(int w) : dist(w), id(w), expanded(w), cap(w) {}
    void clear() { size = 0; }
    bool insert(float dv, int32_t iv) {
        if (size == cap && dv >= dist[size - 1]) return false;
        int lo = std::lower_bound(dist.data(), dist.data() + size, dv) -
                 dist.data();
        if (size < cap) ++size;
        for (int j = size - 1; j > lo; --j) {
            dist[j] = dist[j - 1];
            id[j] = id[j - 1];
            expanded[j] = expanded[j - 1];
        }
        dist[lo] = dv;
        id[lo] = iv;
        expanded[lo] = 0;
        return true;
    }
    int first_unexpanded() const {
        for (int j = 0; j < size; ++j)
            if (!expanded[j]) return j;
        return -1;
    }
};

struct Searcher {
    const Matrix& data;
    const IntMatrix& graph;
    std::vector<int32_t> visit_epoch;
    int32_t epoch = 0;
    Beam beam;
    long long n_hops = 0;

    Searcher(const Matrix& dm, const IntMatrix& gm, int w)
        : data(dm), graph(gm), visit_epoch(dm.n, -1), beam(w) {}

    // greedy_search.h:124-203: seed with the entry, repeatedly expand the
    // nearest unexpanded candidate, prefetching neighbor rows.
    void run(const float* q, int32_t entry) {
        beam.clear();
        ++epoch;
        visit_epoch[entry] = epoch;
        beam.insert(l2(q, data.row(entry), data.d), entry);
        for (;;) {
            int slot = beam.first_unexpanded();
            if (slot < 0) break;
            beam.expanded[slot] = 1;
            ++n_hops;
            const int32_t* nbr = graph.row(beam.id[slot]);
            for (int j = 0; j < graph.d && nbr[j] >= 0; ++j)
                __builtin_prefetch(data.row(nbr[j]));
            for (int j = 0; j < graph.d; ++j) {
                int32_t c = nbr[j];
                if (c < 0) break;
                if (visit_epoch[c] == epoch) continue;
                visit_epoch[c] = epoch;
                beam.insert(l2(q, data.row(c), data.d), c);
            }
        }
    }
};

static int32_t medoid(const Matrix& data) {
    std::vector<double> mean(data.d, 0.0);
    for (int32_t i = 0; i < data.n; ++i) {
        const float* r = data.row(i);
        for (int j = 0; j < data.d; ++j) mean[j] += r[j];
    }
    std::vector<float> m(data.d);
    for (int j = 0; j < data.d; ++j) m[j] = (float)(mean[j] / data.n);
    int32_t best = 0;
    float bd = 1e30f;
    for (int32_t i = 0; i < data.n; ++i) {
        float dv = l2(m.data(), data.row(i), data.d);
        if (dv < bd) { bd = dv; best = i; }
    }
    return best;
}

// RobustPrune (prune.h:39-239 / vamana_build.h): candidates ascending by
// distance to p; keep c unless an already-kept s dominates it
// (alpha * d(s, c) <= d(p, c)).
static void robust_prune(const Matrix& data, int32_t p,
                         std::vector<std::pair<float, int32_t>>& cand,
                         float alpha, int R, int32_t* out, int* out_n) {
    std::sort(cand.begin(), cand.end());
    *out_n = 0;
    for (auto& [dp, c] : cand) {
        if (c == p) continue;
        bool keep = true;
        for (int s = 0; s < *out_n; ++s) {
            if (out[s] == c) { keep = false; break; }
            float dsc = l2(data.row(out[s]), data.row(c), data.d);
            if (alpha * dsc <= dp) { keep = false; break; }
        }
        if (keep) {
            out[(*out_n)++] = c;
            if (*out_n == R) break;
        }
    }
}

// vamana_build.h:221-579's incremental flow: random insertion order; per
// point, greedy-search to collect a candidate pool, RobustPrune it into
// the point's adjacency, then push reverse edges (pruning overflow).
static void build(const Matrix& data, IntMatrix& graph, int R, int L,
                  float alpha) {
    graph.n = data.n;
    graph.d = R;
    graph.v.assign((size_t)data.n * R, -1);
    std::vector<int> deg(data.n, 0);
    int32_t entry = medoid(data);

    std::vector<int32_t> order(data.n);
    std::iota(order.begin(), order.end(), 0);
    std::mt19937 rng(42);
    std::shuffle(order.begin(), order.end(), rng);

    Searcher searcher(data, graph, L);
    std::vector<std::pair<float, int32_t>> cand, rcand;
    std::vector<int32_t> pruned(R);
    for (int32_t t = 0; t < data.n; ++t) {
        int32_t p = order[t];
        if (p == entry) continue;
        searcher.run(data.row(p), entry);
        cand.clear();
        for (int j = 0; j < searcher.beam.size; ++j)
            cand.emplace_back(searcher.beam.dist[j], searcher.beam.id[j]);
        for (int j = 0; j < deg[p]; ++j) {
            int32_t c = graph.row(p)[j];
            cand.emplace_back(l2(data.row(p), data.row(c), data.d), c);
        }
        int n_out = 0;
        robust_prune(data, p, cand, alpha, R, pruned.data(), &n_out);
        std::memcpy(graph.row(p), pruned.data(), n_out * 4);
        for (int j = n_out; j < R; ++j) graph.row(p)[j] = -1;
        deg[p] = n_out;
        for (int j = 0; j < n_out; ++j) {
            int32_t q = pruned[j];
            if (deg[q] < R) {
                graph.row(q)[deg[q]++] = p;
            } else {
                rcand.clear();
                rcand.emplace_back(l2(data.row(q), data.row(p), data.d), p);
                for (int s = 0; s < deg[q]; ++s) {
                    int32_t c = graph.row(q)[s];
                    rcand.emplace_back(l2(data.row(q), data.row(c), data.d),
                                       c);
                }
                int m = 0;
                robust_prune(data, q, rcand, alpha, R, pruned.data(), &m);
                // `pruned` doubles as scratch; restore p's slice after
                std::memcpy(graph.row(q), pruned.data(), m * 4);
                for (int s = m; s < R; ++s) graph.row(q)[s] = -1;
                deg[q] = m;
                std::memcpy(pruned.data(), graph.row(p), n_out * 4);
            }
        }
        if ((t + 1) % 10000 == 0)
            fprintf(stderr, "built %d/%d\n", t + 1, data.n);
    }
    fprintf(stderr, "entry=%d\n", entry);
}

int main(int argc, char** argv) {
    if (argc < 2) { fprintf(stderr, "mode required\n"); return 1; }
    std::string mode = argv[1];
    if (mode == "build") {
        if (argc != 7) { fprintf(stderr, "build args\n"); return 1; }
        Matrix data = load_bin<Matrix>(argv[2]);
        int R = atoi(argv[4]), L = atoi(argv[5]);
        float alpha = atof(argv[6]);
        IntMatrix graph;
        double t0 = now_s();
        build(data, graph, R, L, alpha);
        double dt = now_s() - t0;
        save_graph(argv[3], graph);
        double md = 0;
        for (int32_t i = 0; i < graph.n; ++i)
            for (int j = 0; j < R && graph.row(i)[j] >= 0; ++j) md += 1;
        printf("{\"mode\": \"build\", \"n\": %d, \"R\": %d, \"L\": %d, "
               "\"alpha\": %.2f, \"build_s\": %.1f, \"mean_degree\": %.1f, "
               "\"threads\": 1}\n",
               data.n, R, L, alpha, dt, md / graph.n);
        return 0;
    }
    if (mode == "search") {
        if (argc != 8) { fprintf(stderr, "search args\n"); return 1; }
        Matrix data = load_bin<Matrix>(argv[2]);
        IntMatrix graph = load_bin<IntMatrix>(argv[3]);
        Matrix queries = load_bin<Matrix>(argv[4]);
        IntMatrix gt = load_bin<IntMatrix>(argv[5]);
        int k = atoi(argv[6]);
        int32_t entry = medoid(data);
        for (char* tok = strtok(argv[7], ","); tok;
             tok = strtok(nullptr, ",")) {
            int w = std::max(atoi(tok), k);
            Searcher searcher(data, graph, w);
            // one warm pass (page in), then the timed pass
            for (int32_t i = 0; i < std::min(queries.n, 100); ++i)
                searcher.run(queries.row(i), entry);
            searcher.n_hops = 0;
            double t0 = now_s();
            long long hit = 0;
            for (int32_t i = 0; i < queries.n; ++i) {
                searcher.run(queries.row(i), entry);
                const int32_t* g = gt.row(i);
                int kk = std::min(k, searcher.beam.size);
                for (int a = 0; a < kk; ++a)
                    for (int b = 0; b < k; ++b)
                        if (searcher.beam.id[a] == g[b]) { ++hit; break; }
            }
            double dt = now_s() - t0;
            printf("{\"mode\": \"search\", \"window\": %d, \"k\": %d, "
                   "\"recall\": %.4f, \"qps_1core\": %.1f, "
                   "\"mean_hops\": %.1f, \"threads\": 1}\n",
                   w, k, (double)hit / ((double)queries.n * k),
                   queries.n / dt, (double)searcher.n_hops / queries.n);
            fflush(stdout);
        }
        return 0;
    }
    fprintf(stderr, "unknown mode %s\n", mode.c_str());
    return 1;
}
