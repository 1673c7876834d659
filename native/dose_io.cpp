// dose_io — native data-path runtime for dose_prediction_tpu.
//
// The reference delegates NIfTI IO to SimpleITK (C++) and parallel loading to
// torch DataLoader worker processes (SURVEY.md §2.4). This library is the
// TPU-framework equivalent: a small C++ runtime that
//   * inflates .nii.gz with zlib and parses NIfTI-1 headers,
//   * converts voxels to float32 and applies the OpenKBP preprocessing
//     (clip + scale) during the same pass over memory,
//   * loads many volumes concurrently on a thread pool (one pass per file,
//     no Python in the loop),
// exposed through a C ABI consumed via ctypes (no pybind11 dependency).
//
// Build: see native/Makefile (produces libdose_io.so).

#include <zlib.h>

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr int kHeaderSize = 348;

struct NiftiHeader {
  int16_t dim[8];
  int16_t datatype;
  float pixdim[8];
  float vox_offset;
  float scl_slope;
  float scl_inter;
  int16_t qform_code;
  int16_t sform_code;
  float quatern[6];   // b, c, d, qx, qy, qz
  float srow[12];     // sform rows x/y/z
};

bool parse_header(const uint8_t* raw, size_t len, NiftiHeader* h) {
  if (len < kHeaderSize) return false;
  int32_t sizeof_hdr;
  std::memcpy(&sizeof_hdr, raw, 4);
  if (sizeof_hdr != kHeaderSize) return false;  // big-endian unsupported here
  // magic "n+1\0" / "ni1\0": without this a random 348-byte blob whose first
  // word happens to be 348 would "parse" (data/nifti.py checks it too)
  if (!((raw[344] == 'n' && raw[345] == '+' && raw[346] == '1') ||
        (raw[344] == 'n' && raw[345] == 'i' && raw[346] == '1')))
    return false;
  std::memcpy(h->dim, raw + 40, 16);
  std::memcpy(&h->datatype, raw + 70, 2);
  std::memcpy(h->pixdim, raw + 76, 32);
  std::memcpy(&h->vox_offset, raw + 108, 4);
  std::memcpy(&h->scl_slope, raw + 112, 4);
  std::memcpy(&h->scl_inter, raw + 116, 4);
  std::memcpy(&h->qform_code, raw + 252, 2);
  std::memcpy(&h->sform_code, raw + 254, 2);
  std::memcpy(h->quatern, raw + 256, 24);
  std::memcpy(h->srow, raw + 280, 48);
  return true;
}

// Fill a 3x4 affine (row-major, 12 floats) from sform / qform / pixdim —
// the same priority order as data/nifti.py::read_nifti.
void header_affine(const NiftiHeader& h, float* out12) {
  if (h.sform_code > 0) {
    std::memcpy(out12, h.srow, 48);
    return;
  }
  if (h.qform_code > 0) {
    double b = h.quatern[0], c = h.quatern[1], d = h.quatern[2];
    double a2 = 1.0 - (b * b + c * c + d * d);
    double a = a2 > 0 ? std::sqrt(a2) : 0.0;
    double qfac = h.pixdim[0] < 0 ? -1.0 : 1.0;
    double r[3][3] = {
        {a * a + b * b - c * c - d * d, 2 * (b * c - a * d), 2 * (b * d + a * c)},
        {2 * (b * c + a * d), a * a + c * c - b * b - d * d, 2 * (c * d - a * b)},
        {2 * (b * d - a * c), 2 * (c * d + a * b), a * a + d * d - b * b - c * c}};
    double sx = h.pixdim[1], sy = h.pixdim[2], sz = qfac * h.pixdim[3];
    for (int i = 0; i < 3; ++i) {
      out12[i * 4 + 0] = static_cast<float>(r[i][0] * sx);
      out12[i * 4 + 1] = static_cast<float>(r[i][1] * sy);
      out12[i * 4 + 2] = static_cast<float>(r[i][2] * sz);
      out12[i * 4 + 3] = h.quatern[3 + i];
    }
    return;
  }
  for (int i = 0; i < 12; ++i) out12[i] = 0.0f;
  out12[0] = h.pixdim[1];
  out12[5] = h.pixdim[2];
  out12[10] = h.pixdim[3];
}

// Largest decompressed payload we will accept: the biggest sane volume on
// this data path is ~16 MB (128³ f64 ≈ 16 MB; even 512³ f64 is 1 GiB), while
// a crafted gzip bomb inflates ~1000:1 — without a cap it would exhaust
// memory BEFORE the header/voxel_count validation ever runs.
constexpr size_t kMaxInflate = size_t(1) << 30;  // 1 GiB

// Inflate a whole gzip file into memory; returns false on error.
bool gunzip_file(const char* path, std::vector<uint8_t>* out) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  std::vector<uint8_t> compressed((std::istreambuf_iterator<char>(f)),
                                  std::istreambuf_iterator<char>());
  if (compressed.size() >= 2 && !(compressed[0] == 0x1f && compressed[1] == 0x8b)) {
    *out = std::move(compressed);  // not gzip: plain .nii
    return true;
  }
  z_stream zs{};
  if (inflateInit2(&zs, 16 + MAX_WBITS) != Z_OK) return false;
  zs.next_in = compressed.data();
  zs.avail_in = static_cast<uInt>(compressed.size());
  out->clear();
  out->reserve(compressed.size() * 4);
  std::vector<uint8_t> buf(1 << 20);
  int ret = Z_OK;
  do {
    zs.next_out = buf.data();
    zs.avail_out = static_cast<uInt>(buf.size());
    ret = inflate(&zs, Z_NO_FLUSH);
    if (ret != Z_OK && ret != Z_STREAM_END) {
      inflateEnd(&zs);
      return false;
    }
    out->insert(out->end(), buf.data(), buf.data() + (buf.size() - zs.avail_out));
    if (out->size() > kMaxInflate) {  // gzip bomb: fail before OOM
      inflateEnd(&zs);
      return false;
    }
  } while (ret != Z_STREAM_END);
  inflateEnd(&zs);
  return true;
}

template <typename T>
void convert_to_f32(const uint8_t* src, float* dst, int64_t n, float slope,
                    float inter) {
  const T* s = reinterpret_cast<const T*>(src);
  if (slope == 0.0f) slope = 1.0f;
  if (slope == 1.0f && inter == 0.0f) {
    for (int64_t i = 0; i < n; ++i) dst[i] = static_cast<float>(s[i]);
  } else {
    for (int64_t i = 0; i < n; ++i)
      dst[i] = static_cast<float>(s[i]) * slope + inter;
  }
}

// Simple fixed-size thread pool.
class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> task;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !tasks_.empty(); });
            if (stop_ && tasks_.empty()) return;
            task = std::move(tasks_.front());
            tasks_.pop();
          }
          task();
        }
      });
    }
  }
  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }
  void submit(std::function<void()> f) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      tasks_.push(std::move(f));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> tasks_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

// Validated voxel count: -1 on a lying header (bad rank, non-positive dims,
// overflow) so callers fail cleanly instead of sizing buffers from garbage.
int64_t voxel_count(const NiftiHeader& h) {
  int nd = h.dim[0];
  if (nd < 1 || nd > 7) return -1;
  int64_t n = 1;
  for (int i = 1; i <= nd; ++i) {
    if (h.dim[i] < 1) return -1;
    if (n > (int64_t(1) << 40) / h.dim[i]) return -1;  // > 1 Tvoxel: lying
    n *= h.dim[i];
  }
  return n;
}

int itemsize_of(int16_t datatype) {
  switch (datatype) {
    case 2: case 256: return 1;
    case 4: case 512: return 2;
    case 8: case 16: return 4;
    case 64: return 8;
    default: return 0;
  }
}

// Convert an already-inflated NIfTI byte buffer to f32 into dst (caller
// allocated, must hold voxel_count elements). Returns 0 on success. Split
// from the path-taking wrapper so dose_io_load_full inflates ONCE (it needs
// the raw buffer for the affine as well).
int load_volume_from_raw(const std::vector<uint8_t>& raw, float* dst,
                         int64_t capacity, int64_t* shape_out,
                         float* spacing_out) {
  NiftiHeader h;
  if (!parse_header(raw.data(), raw.size(), &h)) return -2;
  int64_t n = voxel_count(h);
  if (n < 0) return -2;
  if (n > capacity) return -3;
  // vox_offset is a float in the header: reject NaN/negative/absurd BEFORE
  // the size_t cast (which would be UB), then bound the voxel payload — a
  // header claiming more voxels than the file holds must fail, not read
  // past the inflated buffer and return success over garbage
  if (!(h.vox_offset >= kHeaderSize) || h.vox_offset > 1e12f) return -4;
  size_t offset = static_cast<size_t>(h.vox_offset);
  if (raw.size() < offset) return -4;
  int isz = itemsize_of(h.datatype);
  if (isz == 0) return -5;
  if (raw.size() - offset < static_cast<size_t>(n) * isz) return -4;
  if (!std::isfinite(h.scl_slope) || !std::isfinite(h.scl_inter)) {
    h.scl_slope = 1.0f;  // nibabel semantics: ignore bad scl fields
    h.scl_inter = 0.0f;  // (data/nifti.py does the same)
  }
  const uint8_t* data = raw.data() + offset;
  switch (h.datatype) {
    case 2:   convert_to_f32<uint8_t>(data, dst, n, h.scl_slope, h.scl_inter); break;
    case 4:   convert_to_f32<int16_t>(data, dst, n, h.scl_slope, h.scl_inter); break;
    case 8:   convert_to_f32<int32_t>(data, dst, n, h.scl_slope, h.scl_inter); break;
    case 16:  convert_to_f32<float>(data, dst, n, h.scl_slope, h.scl_inter); break;
    case 64:  convert_to_f32<double>(data, dst, n, h.scl_slope, h.scl_inter); break;
    case 256: convert_to_f32<int8_t>(data, dst, n, h.scl_slope, h.scl_inter); break;
    case 512: convert_to_f32<uint16_t>(data, dst, n, h.scl_slope, h.scl_inter); break;
    default: return -5;
  }
  for (int i = 0; i < 3; ++i) {
    shape_out[i] = (h.dim[0] >= i + 1) ? h.dim[i + 1] : 1;
    spacing_out[i] = h.pixdim[i + 1];
  }
  return 0;
}

// Core single-file load: gunzip → parse → convert. Returns 0 on success.
int load_volume_f32(const char* path, float* dst, int64_t capacity,
                    int64_t* shape_out, float* spacing_out) {
  std::vector<uint8_t> raw;
  if (!gunzip_file(path, &raw)) return -1;
  return load_volume_from_raw(raw, dst, capacity, shape_out, spacing_out);
}

// f32 → bf16, round to nearest even. NaN is handled before the rounding
// add: letting the mantissa increment carry into an all-ones exponent would
// turn NaN into ±inf (or, for a full-payload NaN, wrap into -0.0).
// ml_dtypes/numpy astype(bfloat16) canonicalizes NaN to sign|0x7fc0; match
// it bit-for-bit so the parity tests can assert exact equality.
inline uint16_t to_bf16(float f) {
  uint32_t x;
  std::memcpy(&x, &f, 4);
  if ((x & 0x7fffffffu) > 0x7f800000u)
    return static_cast<uint16_t>(((x >> 16) & 0x8000u) | 0x7fc0u);
  uint32_t lsb = (x >> 16) & 1u;
  x += 0x7fffu + lsb;
  return static_cast<uint16_t>(x >> 16);
}

}  // namespace

extern "C" {

// Load one volume to float32 with full geometry: shape, spacing, and the
// 3x4 affine (sform > qform > pixdim priority). Returns 0 on success.
int dose_io_load_full(const char* path, float* dst, int64_t capacity,
                      int64_t* shape_out, float* spacing_out,
                      float* affine12_out) {
  std::vector<uint8_t> raw;
  if (!gunzip_file(path, &raw)) return -1;
  NiftiHeader h;
  if (!parse_header(raw.data(), raw.size(), &h)) return -2;
  header_affine(h, affine12_out);
  // one inflate serves both the affine and the voxel convert (this is the
  // real-data full-geometry path; re-reading the file doubled its IO cost)
  return load_volume_from_raw(raw, dst, capacity, shape_out, spacing_out);
}

// Read the (i,j,k) shape of a NIfTI file without decoding voxels fully.
// Returns 0 on success.
int dose_io_probe(const char* path, int64_t* shape_out, float* spacing_out) {
  std::vector<uint8_t> raw;
  if (!gunzip_file(path, &raw)) return -1;
  NiftiHeader h;
  if (!parse_header(raw.data(), raw.size(), &h)) return -2;
  if (voxel_count(h) < 0) return -2;  // lying dims: don't size buffers from it
  for (int i = 0; i < 3; ++i) {
    shape_out[i] = (h.dim[0] >= i + 1) ? h.dim[i + 1] : 1;
    spacing_out[i] = h.pixdim[i + 1];
  }
  return 0;
}

// Load one volume to float32. dst must hold `capacity` floats.
int dose_io_load(const char* path, float* dst, int64_t capacity,
                 int64_t* shape_out, float* spacing_out) {
  return load_volume_f32(path, dst, capacity, shape_out, spacing_out);
}

// Load `count` volumes concurrently on `n_threads`. paths is a packed array of
// NUL-terminated strings; dst is a contiguous buffer of count*stride floats.
// Per-file status codes land in status_out. Returns 0 if all succeeded.
int dose_io_load_batch(const char** paths, int count, float* dst,
                       int64_t stride, int64_t* shapes_out,
                       float* spacings_out, int* status_out, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> failures{0};
  {
    ThreadPool pool(n_threads);
    std::atomic<int> remaining{count};
    std::mutex done_mu;
    std::condition_variable done_cv;
    for (int i = 0; i < count; ++i) {
      pool.submit([&, i] {
        status_out[i] = load_volume_f32(paths[i], dst + i * stride, stride,
                                        shapes_out + i * 3, spacings_out + i * 3);
        if (status_out[i] != 0) failures.fetch_add(1);
        if (remaining.fetch_sub(1) == 1) {
          std::lock_guard<std::mutex> lk(done_mu);
          done_cv.notify_one();
        }
      });
    }
    std::unique_lock<std::mutex> lk(done_mu);
    done_cv.wait(lk, [&] { return remaining.load() == 0; });
  }
  return failures.load() == 0 ? 0 : -1;
}

// In-place OpenKBP CT preprocessing: clip to [a_min, a_max] then multiply by
// inv_scale (MyIntensityNormalTransform, dataloader_OpenKBP_monai.py:138-146).
void dose_io_preprocess_ct(float* buf, int64_t n, float a_min, float a_max,
                           float inv_scale) {
  for (int64_t i = 0; i < n; ++i) {
    float v = buf[i];
    v = v < a_min ? a_min : (v > a_max ? a_max : v);
    buf[i] = v * inv_scale;
  }
}

// Fused dose-task augmentation + bf16 cast (the train-feed hot path: the
// numpy chain does several full-volume copies and the host is 1-core; this
// single gather pass emits bf16 directly, halving the H2D payload too).
//
// Semantics mirror data/transforms.augment_dose_sample: intensity shift on
// the LAST input channel, then flips over the three spatial axes, then
// rot90(k, axes=(0,1)). Random DECISIONS are drawn by the Python caller (one
// rng, same order as the numpy chain) and passed in — this function is
// deterministic. np.rot90(m, 1, (0,1)): out[i, j] = m[j, H_in-1-i].
//
// inp: (D,H,W,Ci) f32 contiguous; gt: (D,H,W,Cg). Outputs have spatial dims
// (D',H') = rot_k odd ? (H,D) : (D,H). flip_mask bit a = flip input axis a.
int dose_io_augment_dose_bf16(const float* inp, const float* gt,
                              int64_t d, int64_t h, int64_t w,
                              int64_t ci, int64_t cg,
                              float shift, int flip_mask, int rot_k,
                              uint16_t* out_inp, uint16_t* out_gt,
                              int n_threads) {
  rot_k = ((rot_k % 4) + 4) % 4;
  const int64_t od = (rot_k % 2) ? h : d;
  const int64_t oh = (rot_k % 2) ? d : h;

  auto process_rows = [&](int64_t row0, int64_t row1) {
    for (int64_t i = row0; i < row1; ++i) {
      for (int64_t j = 0; j < oh; ++j) {
        // invert rot90^k on the (0,1) plane (np.rot90: out[i,j] = in[j, H-1-i])
        int64_t sd, sh;
        switch (rot_k) {
          case 0: sd = i;          sh = j;          break;
          case 1: sd = j;          sh = h - 1 - i;  break;   // out(H,D)
          case 2: sd = d - 1 - i;  sh = h - 1 - j;  break;
          default: sd = d - 1 - j; sh = i;          break;   // k=3, out(H,D)
        }
        if (flip_mask & 1) sd = d - 1 - sd;
        if (flip_mask & 2) sh = h - 1 - sh;
        const int64_t out_row = (i * oh + j) * w;
        for (int64_t k = 0; k < w; ++k) {
          int64_t sw = (flip_mask & 4) ? (w - 1 - k) : k;
          const float* pin = inp + ((sd * h + sh) * w + sw) * ci;
          uint16_t* pout = out_inp + (out_row + k) * ci;
          for (int64_t c = 0; c < ci - 1; ++c) pout[c] = to_bf16(pin[c]);
          pout[ci - 1] = to_bf16(pin[ci - 1] + shift);
          const float* ping = gt + ((sd * h + sh) * w + sw) * cg;
          uint16_t* poutg = out_gt + (out_row + k) * cg;
          for (int64_t c = 0; c < cg; ++c) poutg[c] = to_bf16(ping[c]);
        }
      }
    }
  };

  if (n_threads <= 1 || od < 2 * n_threads) {
    process_rows(0, od);
    return 0;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (od + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t r0 = t * chunk, r1 = std::min(od, r0 + chunk);
    if (r0 >= r1) break;
    threads.emplace_back([=] { process_rows(r0, r1); });
  }
  for (auto& th : threads) th.join();
  return 0;
}

// Fused seg-task crop + augmentation + bf16 cast (the seg train-feed hot
// path). Semantics mirror data/transforms.augment_seg_sample for ONE crop:
// window [z0:z0+cd, y0:y0+ch, x0:x0+cw] of the (D,H,W) volume, independent
// flips over the three crop axes, then rot90(k, axes=(0,1)), CT intensity
// shift. Decisions are drawn by the Python caller (same rng stream as the
// numpy chain); this function is a deterministic single gather pass.
// ct: (D,H,W) f32; labels: (D,H,W) u8. Output crop dims (od,oh,cw) with
// (od,oh) = rot_k odd ? (ch,cd) : (cd,ch).
int dose_io_augment_seg_bf16(const float* ct, const uint8_t* labels,
                             int64_t d, int64_t h, int64_t w,
                             int64_t z0, int64_t y0, int64_t x0,
                             int64_t cd, int64_t ch, int64_t cw,
                             float shift, int flip_mask, int rot_k,
                             uint16_t* out_ct, uint8_t* out_labels,
                             int n_threads) {
  if (z0 < 0 || y0 < 0 || x0 < 0 ||
      z0 + cd > d || y0 + ch > h || x0 + cw > w)
    return 1;
  rot_k = ((rot_k % 4) + 4) % 4;
  const int64_t od = (rot_k % 2) ? ch : cd;
  const int64_t oh = (rot_k % 2) ? cd : ch;

  auto process_rows = [&](int64_t row0, int64_t row1) {
    for (int64_t i = row0; i < row1; ++i) {
      for (int64_t j = 0; j < oh; ++j) {
        // invert rot90^k on the crop (np.rot90: out[i,j] = in[j, CH-1-i]),
        // then invert the (involutive) flips, then add the crop offset
        int64_t sd, sh;
        switch (rot_k) {
          case 0: sd = i;           sh = j;           break;
          case 1: sd = j;           sh = ch - 1 - i;  break;   // out (CH,CD)
          case 2: sd = cd - 1 - i;  sh = ch - 1 - j;  break;
          default: sd = cd - 1 - j; sh = i;           break;   // k=3
        }
        if (flip_mask & 1) sd = cd - 1 - sd;
        if (flip_mask & 2) sh = ch - 1 - sh;
        const int64_t src_row = ((z0 + sd) * h + (y0 + sh)) * w + x0;
        const int64_t out_row = (i * oh + j) * cw;
        for (int64_t k = 0; k < cw; ++k) {
          const int64_t sw = (flip_mask & 4) ? (cw - 1 - k) : k;
          out_ct[out_row + k] = to_bf16(ct[src_row + sw] + shift);
          out_labels[out_row + k] = labels[src_row + sw];
        }
      }
    }
  };

  if (n_threads <= 1 || od < 2 * n_threads) {
    process_rows(0, od);
    return 0;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (od + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t r0 = t * chunk, r1 = std::min(od, r0 + chunk);
    if (r0 >= r1) break;
    threads.emplace_back([=] { process_rows(r0, r1); });
  }
  for (auto& th : threads) th.join();
  return 0;
}

}  // extern "C"
