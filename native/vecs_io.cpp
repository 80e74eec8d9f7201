// Native data loader for *vecs interchange files.
//
// TPU-native runtime analog of the reference's C++ IO layer
// (include/svs/core/io/vecs.h readers + lib/file.h): the hot path for
// billion-scale ingest is parsing dim-prefixed rows and laying them out into
// the padded (n_pad, d_pad) host buffer the device expects.  Doing this in
// one pass (mmap -> validate -> strided copy with zero padding) avoids the
// extra full-size copy a numpy reshape+pad pipeline costs, and parallelizes
// across row blocks with std::thread (the reference's threadpool analog for
// the loader).
//
// Exposed as a C ABI consumed via ctypes (no pybind11 in this image).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// Returns 0 on success; negative error codes otherwise.
//   -1 open failed, -2 stat/mmap failed, -3 bad header, -4 size mismatch,
//   -5 non-uniform rows.
//
// probe_vecs: read (n, dim) without touching payload.
int probe_vecs(const char* path, int64_t elt_size, int64_t* out_n,
               int64_t* out_dim) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return -1;
    struct stat st;
    if (fstat(fd, &st) != 0) { close(fd); return -2; }
    if (st.st_size < 4) { close(fd); return -3; }
    int32_t dim = 0;
    if (pread(fd, &dim, 4, 0) != 4 || dim <= 0) { close(fd); return -3; }
    const int64_t row_bytes = 4 + (int64_t)dim * elt_size;
    if (st.st_size % row_bytes != 0) { close(fd); return -4; }
    *out_n = st.st_size / row_bytes;
    *out_dim = dim;
    close(fd);
    return 0;
}

// read_vecs_padded: parse the whole file into caller-allocated
// (n_pad x d_pad * elt_size) buffer `out`, zero-filling padding. Validates
// every row's dim prefix. Parallel across `n_threads` row blocks.
int read_vecs_padded(const char* path, int64_t elt_size, uint8_t* out,
                     int64_t n_pad, int64_t d_pad_bytes, int64_t max_rows,
                     int n_threads) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return -1;
    struct stat st;
    if (fstat(fd, &st) != 0) { close(fd); return -2; }
    const uint8_t* base =
        (const uint8_t*)mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
    close(fd);
    if (base == MAP_FAILED) return -2;

    int32_t dim = 0;
    std::memcpy(&dim, base, 4);
    if (dim <= 0) { munmap((void*)base, st.st_size); return -3; }
    const int64_t row_bytes = 4 + (int64_t)dim * elt_size;
    if (st.st_size % row_bytes != 0) {
        munmap((void*)base, st.st_size);
        return -4;
    }
    int64_t n = st.st_size / row_bytes;
    if (max_rows >= 0 && max_rows < n) n = max_rows;
    if (n > n_pad) { munmap((void*)base, st.st_size); return -4; }
    const int64_t payload = (int64_t)dim * elt_size;
    if (payload > d_pad_bytes) { munmap((void*)base, st.st_size); return -4; }

    std::memset(out, 0, (size_t)(n_pad * d_pad_bytes));

    if (n_threads < 1) n_threads = 1;
    std::atomic<int> status{0};
    const int64_t block = (n + n_threads - 1) / n_threads;
    std::vector<std::thread> workers;
    workers.reserve(n_threads);
    for (int t = 0; t < n_threads; ++t) {
        const int64_t lo = t * block;
        const int64_t hi = std::min(n, lo + block);
        if (lo >= hi) break;
        workers.emplace_back([=, &status]() {
            for (int64_t i = lo; i < hi; ++i) {
                const uint8_t* row = base + i * row_bytes;
                int32_t row_dim = 0;
                std::memcpy(&row_dim, row, 4);
                if (row_dim != dim) {
                    status.store(-5, std::memory_order_relaxed);
                    return;
                }
                std::memcpy(out + i * d_pad_bytes, row + 4, (size_t)payload);
            }
        });
    }
    for (auto& w : workers) w.join();
    munmap((void*)base, st.st_size);
    return status.load();
}

// write_vecs: serialize an (n x dim * elt_size) contiguous payload buffer
// (already un-padded) into dim-prefixed rows.
int write_vecs(const char* path, const uint8_t* data, int64_t n, int32_t dim,
               int64_t elt_size) {
    FILE* f = fopen(path, "wb");
    if (!f) return -1;
    const int64_t payload = (int64_t)dim * elt_size;
    for (int64_t i = 0; i < n; ++i) {
        if (fwrite(&dim, 4, 1, f) != 1 ||
            fwrite(data + i * payload, (size_t)payload, 1, f) != 1) {
            fclose(f);
            return -2;
        }
    }
    fclose(f);
    return 0;
}

}  // extern "C"
