// Threaded batch gather for the multivae_tpu data loader.
//
// The hot host-side operation of the training loop is assembling a batch
// from a dataset array with fancy indexing (one row-gather per modality per
// step). numpy's take() is single-threaded memcpy; this library spreads the
// row copies over a thread pool so large multimodal batches (e.g. PolyMNIST:
// 5 x (256, 3, 28, 28)) are assembled at memory bandwidth, keeping the
// host-to-device prefetch pipeline ahead of the TPU step.
//
// Exposed via the C ABI for ctypes (no pybind11 in this environment).

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

extern "C" {

// Gather rows: dst[i] = src[idx[i]] for i in [0, n_idx).
// row_bytes is the size of one row in bytes; src has arbitrary row count
// (indices are trusted to be in range).
void gather_rows(const char* src, const int64_t* idx, char* dst,
                 int64_t n_idx, int64_t row_bytes, int n_threads) {
  if (n_threads <= 1 || n_idx < n_threads * 4) {
    for (int64_t i = 0; i < n_idx; ++i) {
      std::memcpy(dst + i * row_bytes, src + idx[i] * row_bytes, row_bytes);
    }
    return;
  }
  std::vector<std::thread> workers;
  workers.reserve(n_threads);
  const int64_t chunk = (n_idx + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int64_t lo = t * chunk;
    const int64_t hi = std::min(lo + chunk, n_idx);
    if (lo >= hi) break;
    workers.emplace_back([=]() {
      for (int64_t i = lo; i < hi; ++i) {
        std::memcpy(dst + i * row_bytes, src + idx[i] * row_bytes,
                    row_bytes);
      }
    });
  }
  for (auto& w : workers) w.join();
}

// Gather rows from multiple modality arrays that share the index vector.
// srcs/dsts are arrays of pointers; row_bytes per modality.
void gather_rows_multi(const char** srcs, const int64_t* idx, char** dsts,
                       int64_t n_idx, const int64_t* row_bytes,
                       int n_modalities, int n_threads) {
  std::vector<std::thread> workers;
  workers.reserve(n_threads);
  // Parallelize over (modality, row-chunk) work items.
  const int per_mod_threads = std::max(1, n_threads / std::max(1, n_modalities));
  for (int m = 0; m < n_modalities; ++m) {
    const char* src = srcs[m];
    char* dst = dsts[m];
    const int64_t rb = row_bytes[m];
    const int64_t chunk =
        (n_idx + per_mod_threads - 1) / per_mod_threads;
    for (int t = 0; t < per_mod_threads; ++t) {
      const int64_t lo = t * chunk;
      const int64_t hi = std::min(lo + chunk, n_idx);
      if (lo >= hi) break;
      workers.emplace_back([=]() {
        for (int64_t i = lo; i < hi; ++i) {
          std::memcpy(dst + i * rb, src + idx[i] * rb, rb);
        }
      });
    }
  }
  for (auto& w : workers) w.join();
}

}  // extern "C"
