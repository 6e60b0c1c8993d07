// Native host-side batch assembly + record-IO primitives.
//
// The reference leaned on TorchRec/FBGEMM native ops for its host batch
// path (KJT construction, pinned-memory collate - SURVEY.md §2.9). The
// TPU-native equivalent is simpler: batches are contiguous row-gathers out
// of column-major feature stores. numpy's fancy-indexing gather is
// single-threaded; this library does the same memcpy fan-out on all cores.
//
// Also provides CRC32C (Castagnoli, software slice-by-8) for the TFRecord
// reader/writer in io/tfrecord.py (format parity with the reference's
// src/tfrecord tooling without depending on TensorFlow).
//
// Build: g++ -O3 -march=native -shared -fPIC -pthread gather.cpp -o _native.so

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <algorithm>

extern "C" {

// Gather rows: dst[i, :] = src[rows[i], :]. row_bytes = width * itemsize.
// Threads split the batch; each does pure memcpy (no GIL, no allocation).
void gather_rows(const char* src, const int64_t* rows, char* dst,
                 int64_t n_rows, int64_t row_bytes, int64_t n_threads) {
  if (n_threads <= 0) n_threads = 1;
  n_threads = std::min<int64_t>(n_threads, n_rows > 0 ? n_rows : 1);
  auto worker = [=](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      std::memcpy(dst + i * row_bytes, src + rows[i] * row_bytes, row_bytes);
    }
  };
  if (n_threads == 1) {
    worker(0, n_rows);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n_rows + n_threads - 1) / n_threads;
  for (int64_t t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(lo + chunk, n_rows);
    if (lo >= hi) break;
    threads.emplace_back(worker, lo, hi);
  }
  for (auto& th : threads) th.join();
}

// Paired gather for the two-tower batch: one call assembles all four
// matrices (notice dense+cat, company dense+cat) with one thread pool.
void gather_pair_batch(const char* n_dense, const char* n_cat,
                       const char* c_dense, const char* c_cat,
                       const int64_t* notice_rows, const int64_t* company_rows,
                       char* out_n_dense, char* out_n_cat,
                       char* out_c_dense, char* out_c_cat,
                       int64_t batch, int64_t n_dense_bytes, int64_t n_cat_bytes,
                       int64_t c_dense_bytes, int64_t c_cat_bytes,
                       int64_t n_threads) {
  if (n_threads <= 0) n_threads = 1;
  n_threads = std::min<int64_t>(n_threads, batch > 0 ? batch : 1);
  auto worker = [=](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      int64_t nr = notice_rows[i], cr = company_rows[i];
      std::memcpy(out_n_dense + i * n_dense_bytes, n_dense + nr * n_dense_bytes, n_dense_bytes);
      std::memcpy(out_n_cat + i * n_cat_bytes, n_cat + nr * n_cat_bytes, n_cat_bytes);
      std::memcpy(out_c_dense + i * c_dense_bytes, c_dense + cr * c_dense_bytes, c_dense_bytes);
      std::memcpy(out_c_cat + i * c_cat_bytes, c_cat + cr * c_cat_bytes, c_cat_bytes);
    }
  };
  if (n_threads == 1) {
    worker(0, batch);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (batch + n_threads - 1) / n_threads;
  for (int64_t t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk, hi = std::min(lo + chunk, batch);
    if (lo >= hi) break;
    threads.emplace_back(worker, lo, hi);
  }
  for (auto& th : threads) th.join();
}

// ---------------------------------------------------------------------------
// CRC32C (Castagnoli), slice-by-8 software implementation.
// ---------------------------------------------------------------------------

static uint32_t kCrcTable[8][256];
static bool kCrcInit = []() {
  const uint32_t poly = 0x82F63B78u;  // reflected CRC-32C
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t crc = i;
    for (int j = 0; j < 8; ++j) crc = (crc >> 1) ^ ((crc & 1) ? poly : 0);
    kCrcTable[0][i] = crc;
  }
  for (uint32_t i = 0; i < 256; ++i)
    for (int t = 1; t < 8; ++t)
      kCrcTable[t][i] = (kCrcTable[t - 1][i] >> 8) ^ kCrcTable[0][kCrcTable[t - 1][i] & 0xFF];
  return true;
}();

uint32_t crc32c(const uint8_t* data, uint64_t n, uint32_t crc) {
  crc = ~crc;
  while (n >= 8) {
    crc ^= (uint32_t)data[0] | ((uint32_t)data[1] << 8) |
           ((uint32_t)data[2] << 16) | ((uint32_t)data[3] << 24);
    uint32_t hi = (uint32_t)data[4] | ((uint32_t)data[5] << 8) |
                  ((uint32_t)data[6] << 16) | ((uint32_t)data[7] << 24);
    crc = kCrcTable[7][crc & 0xFF] ^ kCrcTable[6][(crc >> 8) & 0xFF] ^
          kCrcTable[5][(crc >> 16) & 0xFF] ^ kCrcTable[4][crc >> 24] ^
          kCrcTable[3][hi & 0xFF] ^ kCrcTable[2][(hi >> 8) & 0xFF] ^
          kCrcTable[1][(hi >> 16) & 0xFF] ^ kCrcTable[0][hi >> 24];
    data += 8;
    n -= 8;
  }
  while (n--) crc = (crc >> 8) ^ kCrcTable[0][(crc ^ *data++) & 0xFF];
  return ~crc;
}

}  // extern "C"
