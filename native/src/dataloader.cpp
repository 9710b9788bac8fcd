// Native batch loader for precomputed mel caches.
//
// TPU hosts feed the input pipeline from many CPU cores; Python-side
// np.load + pad + transpose per utterance serializes on the GIL.  This
// library fills padded, time-major batch buffers directly from the .npy
// caches with a C++ thread pool — one call per batch, zero Python-object
// churn.  (TPU-native replacement for the reference's 16-worker torch
// DataLoader; reference: matcha/data/text_mel_datamodule.py + configs.)
//
// .npy contract (written by matcha_tpu.utils.precompute_mels): v1/v2 header,
// dtype <f4, C-order, shape (n_mels, T) channel-major.  Output buffers are
// time-major (B, T_pad, n_mels), zero-padded.
//
// C API (ctypes-friendly), thread-safe, no global state:
//   mtpu_mel_length(path)                      -> T (frames) or -errno
//   mtpu_fill_batch(paths, b, out, t_pad, n_mels, lens, threads) -> 0 or -1

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct NpyInfo {
  long rows = 0;  // first shape dim  (n_mels for our caches)
  long cols = 0;  // second shape dim (frames)
  long header_bytes = 0;
  bool ok = false;
  bool fortran = false;
};

NpyInfo parse_npy_header(FILE* f) {
  NpyInfo info;
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8) return info;
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return info;
  int major = magic[6];
  uint32_t header_len = 0;
  if (major == 1) {
    unsigned char l[2];
    if (fread(l, 1, 2, f) != 2) return info;
    header_len = l[0] | (l[1] << 8);
    info.header_bytes = 10 + header_len;
  } else {
    unsigned char l[4];
    if (fread(l, 1, 4, f) != 4) return info;
    header_len = l[0] | (l[1] << 8) | (l[2] << 16) | ((uint32_t)l[3] << 24);
    info.header_bytes = 12 + header_len;
  }
  std::string header(header_len, '\0');
  if (fread(&header[0], 1, header_len, f) != header_len) return info;
  if (header.find("'<f4'") == std::string::npos &&
      header.find("\"<f4\"") == std::string::npos)
    return info;  // only float32 caches supported
  info.fortran = header.find("'fortran_order': True") != std::string::npos;
  auto pos = header.find("'shape':");
  if (pos == std::string::npos) return info;
  auto open = header.find('(', pos);
  auto close = header.find(')', open);
  if (open == std::string::npos || close == std::string::npos) return info;
  std::string shape = header.substr(open + 1, close - open - 1);
  long dims[2] = {0, 0};
  int ndim = 0;
  const char* p = shape.c_str();
  while (*p && ndim < 2) {
    while (*p == ' ' || *p == ',') ++p;
    if (*p == '\0') break;
    dims[ndim++] = strtol(p, const_cast<char**>(&p), 10);
  }
  if (ndim == 0) return info;
  info.rows = dims[0];
  info.cols = ndim > 1 ? dims[1] : 1;
  info.ok = true;
  return info;
}

}  // namespace

extern "C" {

// Frame count (time dim) of a channel-major (n_mels, T) cache, header-only.
long mtpu_mel_length(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  NpyInfo info = parse_npy_header(f);
  fclose(f);
  if (!info.ok) return -2;
  return info.cols;
}

// Load one cache into a time-major (t_pad, n_mels) zero-padded slab.
// Returns frames written, or negative on error.
static long load_one(const char* path, float* out, long t_pad, long n_mels) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  NpyInfo info = parse_npy_header(f);
  if (!info.ok) {
    fclose(f);
    return -2;
  }
  long mels = info.rows, frames = info.cols;
  if (info.fortran && mels == n_mels) {
    // F-order (n_mels, T) is byte-identical to C-order (T, n_mels):
    // the data is already time-major — direct copy
    long t = frames < t_pad ? frames : t_pad;
    std::vector<float> buf((size_t)t * n_mels);
    if (fread(buf.data(), 4, buf.size(), f) != buf.size()) {
      fclose(f);
      return -3;
    }
    memcpy(out, buf.data(), (size_t)t * n_mels * 4);
    fclose(f);
    return t;
  }
  if (info.fortran) {
    fclose(f);
    return -2;
  }
  if (mels != n_mels) {  // maybe stored time-major already
    if (frames == n_mels) {
      // (T, n_mels) C-order: rows are frames — direct strided copy
      long t = mels < t_pad ? mels : t_pad;
      std::vector<float> buf((size_t)t * n_mels);
      if (fread(buf.data(), 4, buf.size(), f) != buf.size()) {
        fclose(f);
        return -3;
      }
      memcpy(out, buf.data(), (size_t)t * n_mels * 4);
      fclose(f);
      return t;
    }
    fclose(f);
    return -4;
  }
  long t = frames < t_pad ? frames : t_pad;
  std::vector<float> buf((size_t)mels * frames);
  if (fread(buf.data(), 4, buf.size(), f) != buf.size()) {
    fclose(f);
    return -3;
  }
  fclose(f);
  // transpose (n_mels, T) → (T, n_mels)
  for (long c = 0; c < mels; ++c) {
    const float* src = buf.data() + (size_t)c * frames;
    for (long j = 0; j < t; ++j) out[(size_t)j * n_mels + c] = src[j];
  }
  return t;
}

// Fill a padded batch: paths[b] caches → out (b, t_pad, n_mels) zeroed slab.
// lens[b] receives per-item frame counts.  Returns 0, or the (negative)
// error of the first failing item.
int mtpu_fill_batch(const char** paths, int b, float* out, long t_pad,
                    long n_mels, int* lens, int threads) {
  memset(out, 0, (size_t)b * t_pad * n_mels * 4);
  std::atomic<int> next(0);
  std::atomic<int> err(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= b) return;
      long t = load_one(paths[i], out + (size_t)i * t_pad * n_mels, t_pad,
                        n_mels);
      if (t < 0) {
        err.store((int)t);
        lens[i] = 0;
      } else {
        lens[i] = (int)t;
      }
    }
  };
  int n_threads = threads > 0 ? threads : (int)std::thread::hardware_concurrency();
  if (n_threads > b) n_threads = b;
  if (n_threads <= 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (int i = 0; i < n_threads; ++i) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return err.load();
}

}  // extern "C"
