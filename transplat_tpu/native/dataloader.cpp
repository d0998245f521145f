// Native data-loader: multi-threaded JPEG decode + bilinear resize.
//
// TPU-native replacement for the reference's torch DataLoader worker
// processes (SURVEY.md §2.2): the host-side bottleneck when feeding a TPU is
// JPEG decode of the RE10K chunk images; this library decodes batches across
// a thread pool with libjpeg and optionally resizes, exposed to Python via
// ctypes (transplat_tpu/native/__init__.py).
//
// Build: make -C transplat_tpu/native

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode one JPEG into interleaved RGB. Returns 0 on success.
int decode_one(const uint8_t* data, size_t size, uint8_t* out, int out_h,
               int out_w) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, size);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int h = cinfo.output_height;
  const int w = cinfo.output_width;
  if (h != out_h || w != out_w) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 3;  // caller must allocate the native size
  }
  std::vector<uint8_t> row(static_cast<size_t>(w) * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* dst = out + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    uint8_t* rows[1] = {dst};
    jpeg_read_scanlines(&cinfo, rows, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

void parallel_for(int n, int num_threads,
                  const std::function<void(int)>& fn) {
  if (num_threads <= 1 || n <= 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int> next{0};
  std::vector<std::thread> pool;
  const int workers = std::min(num_threads, n);
  pool.reserve(workers);
  for (int t = 0; t < workers; ++t) {
    pool.emplace_back([&] {
      for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) fn(i);
    });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Peek (height, width) of a JPEG without full decode. Returns 0 on success.
int jpeg_shape(const uint8_t* data, size_t size, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, size);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  *h = cinfo.image_height;
  *w = cinfo.image_width;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode n JPEGs (concatenated in `data` at `offsets`, sizes in `sizes`)
// into out[n, h, w, 3] uint8. All images must have shape (h, w).
// Returns the number of failed decodes.
int decode_jpeg_batch(const uint8_t* data, const int64_t* offsets,
                      const int64_t* sizes, int n, uint8_t* out, int h, int w,
                      int num_threads) {
  std::atomic<int> failures{0};
  parallel_for(n, num_threads, [&](int i) {
    const uint8_t* src = data + offsets[i];
    uint8_t* dst = out + static_cast<size_t>(i) * h * w * 3;
    if (decode_one(src, static_cast<size_t>(sizes[i]), dst, h, w) != 0) {
      failures.fetch_add(1);
    }
  });
  return failures.load();
}

// Bilinear resize of a batch: in[n, h_in, w_in, 3] u8 -> out[n, h, w, 3] u8
// (half-pixel centers, matches PIL/torch antialias=False bilinear closely; the
// Python path keeps PIL LANCZOS for bit-parity with the reference).
void resize_bilinear_batch(const uint8_t* in, int n, int h_in, int w_in,
                           uint8_t* out, int h_out, int w_out,
                           int num_threads) {
  const float sy = static_cast<float>(h_in) / h_out;
  const float sx = static_cast<float>(w_in) / w_out;
  parallel_for(n, num_threads, [&](int i) {
    const uint8_t* src = in + static_cast<size_t>(i) * h_in * w_in * 3;
    uint8_t* dst = out + static_cast<size_t>(i) * h_out * w_out * 3;
    for (int y = 0; y < h_out; ++y) {
      float fy = (y + 0.5f) * sy - 0.5f;
      fy = std::max(0.0f, std::min(fy, static_cast<float>(h_in - 1)));
      const int y0 = static_cast<int>(fy);
      const int y1 = std::min(y0 + 1, h_in - 1);
      const float wy = fy - y0;
      for (int x = 0; x < w_out; ++x) {
        float fx = (x + 0.5f) * sx - 0.5f;
        fx = std::max(0.0f, std::min(fx, static_cast<float>(w_in - 1)));
        const int x0 = static_cast<int>(fx);
        const int x1 = std::min(x0 + 1, w_in - 1);
        const float wx = fx - x0;
        for (int c = 0; c < 3; ++c) {
          const float v00 = src[(y0 * w_in + x0) * 3 + c];
          const float v01 = src[(y0 * w_in + x1) * 3 + c];
          const float v10 = src[(y1 * w_in + x0) * 3 + c];
          const float v11 = src[(y1 * w_in + x1) * 3 + c];
          const float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                          v10 * wy * (1 - wx) + v11 * wy * wx;
          dst[(y * w_out + x) * 3 + c] =
              static_cast<uint8_t>(std::lround(std::max(0.f, std::min(255.f, v))));
        }
      }
    }
  });
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Separable LANCZOS(3) resize, PIL-faithful.
//
// Replicates Pillow's ImagingResample convolution pipeline (horizontal pass
// to a uint8 intermediate, then vertical; int32 fixed-point coefficients
// with PRECISION_BITS = 32 - 8 - 2 and round-half-away rounding) so the
// native path preserves the reference's PIL-LANCZOS data semantics
// (/root/reference/src/dataset/shims/crop_shim.py:80-95) while cutting the
// dominant per-example cost (PIL resize measured at 54% of example time).
// ---------------------------------------------------------------------------

namespace {

constexpr int kPrecisionBits = 32 - 8 - 2;

double sinc(double x) {
  if (x == 0.0) return 1.0;
  const double px = 3.14159265358979323846 * x;
  return std::sin(px) / px;
}

double lanczos3(double x) {
  if (x <= -3.0 || x >= 3.0) return 0.0;
  return sinc(x) * sinc(x / 3.0);
}

// Per-output-pixel coefficient table (PIL precompute_coeffs): returns the
// max kernel size; bounds[2*i] = xmin, bounds[2*i+1] = xcount; kk holds
// ksize int32 fixed-point coefficients per output pixel.
int precompute_coeffs(int in_size, int out_size, std::vector<int>& bounds,
                      std::vector<int>& kk) {
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double ss = 1.0 / filterscale;
  const double support = 3.0 * filterscale;
  const int ksize = static_cast<int>(std::ceil(support)) * 2 + 1;

  bounds.assign(static_cast<size_t>(out_size) * 2, 0);
  kk.assign(static_cast<size_t>(out_size) * ksize, 0);
  std::vector<double> prekk(ksize);

  for (int xx = 0; xx < out_size; ++xx) {
    const double center = (xx + 0.5) * scale;
    double ww = 0.0;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    for (int x = 0; x < xmax; ++x) {
      const double w = lanczos3((x + xmin - center + 0.5) * ss);
      prekk[x] = w;
      ww += w;
    }
    for (int x = 0; x < xmax; ++x) {
      if (ww != 0.0) prekk[x] /= ww;
      const double v = prekk[x] * (1 << kPrecisionBits);
      kk[static_cast<size_t>(xx) * ksize + x] =
          static_cast<int>(v < 0 ? v - 0.5 : v + 0.5);
    }
    bounds[2 * xx] = xmin;
    bounds[2 * xx + 1] = xmax;
  }
  return ksize;
}

inline uint8_t clip8(int in) {
  const int v = in >> kPrecisionBits;
  return static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
}

}  // namespace

extern "C" {

// LANCZOS(3) resize of a batch: in[n, h_in, w_in, 3] u8 -> out[n, h, w, 3]
// u8, PIL Image.resize(..., Image.LANCZOS) semantics.
void resize_lanczos_batch(const uint8_t* in, int n, int h_in, int w_in,
                          uint8_t* out, int h_out, int w_out,
                          int num_threads) {
  std::vector<int> xbounds, xkk, ybounds, ykk;
  const int xksize = precompute_coeffs(w_in, w_out, xbounds, xkk);
  const int yksize = precompute_coeffs(h_in, h_out, ybounds, ykk);

  parallel_for(n, num_threads, [&](int i) {
    const uint8_t* src = in + static_cast<size_t>(i) * h_in * w_in * 3;
    uint8_t* dst = out + static_cast<size_t>(i) * h_out * w_out * 3;
    // Horizontal pass into a uint8 intermediate (h_in, w_out, 3) — PIL
    // quantizes between passes, so we must too for parity. Channels go
    // planar with a zero-coefficient-padded constant-trip inner loop
    // (coefficients beyond xcount are zero, the planes are padded by
    // xksize), so the compiler unrolls/vectorizes the kernel walk.
    std::vector<uint8_t> tmp(static_cast<size_t>(h_in) * w_out * 3);
    std::vector<uint8_t> plane(static_cast<size_t>(3) * (w_in + xksize), 0);
    uint8_t* p0 = plane.data();
    uint8_t* p1 = p0 + (w_in + xksize);
    uint8_t* p2 = p1 + (w_in + xksize);
    for (int y = 0; y < h_in; ++y) {
      const uint8_t* srow = src + static_cast<size_t>(y) * w_in * 3;
      for (int x = 0; x < w_in; ++x) {
        p0[x] = srow[x * 3 + 0];
        p1[x] = srow[x * 3 + 1];
        p2[x] = srow[x * 3 + 2];
      }
      uint8_t* trow = tmp.data() + static_cast<size_t>(y) * w_out * 3;
      for (int x = 0; x < w_out; ++x) {
        const int xmin = xbounds[2 * x];
        const int* k = xkk.data() + static_cast<size_t>(x) * xksize;
        int ss0 = 1 << (kPrecisionBits - 1);
        int ss1 = ss0, ss2 = ss0;
        for (int xi = 0; xi < xksize; ++xi) {
          ss0 += p0[xmin + xi] * k[xi];
          ss1 += p1[xmin + xi] * k[xi];
          ss2 += p2[xmin + xi] * k[xi];
        }
        trow[x * 3 + 0] = clip8(ss0);
        trow[x * 3 + 1] = clip8(ss1);
        trow[x * 3 + 2] = clip8(ss2);
      }
    }
    // Vertical pass, row-streaming: accumulate whole contributing rows into
    // a contiguous int32 accumulator (auto-vectorizes over w_out * 3 lanes)
    // instead of per-pixel column walks.
    std::vector<int> acc(static_cast<size_t>(w_out) * 3);
    for (int y = 0; y < h_out; ++y) {
      const int ymin = ybounds[2 * y];
      const int ycount = ybounds[2 * y + 1];
      const int* k = ykk.data() + static_cast<size_t>(y) * yksize;
      std::fill(acc.begin(), acc.end(), 1 << (kPrecisionBits - 1));
      for (int yi = 0; yi < ycount; ++yi) {
        const uint8_t* trow =
            tmp.data() + static_cast<size_t>(ymin + yi) * w_out * 3;
        const int kv = k[yi];
        int* a = acc.data();
        for (int j = 0; j < w_out * 3; ++j) a[j] += trow[j] * kv;
      }
      uint8_t* drow = dst + static_cast<size_t>(y) * w_out * 3;
      for (int j = 0; j < w_out * 3; ++j) drow[j] = clip8(acc[j]);
    }
  });
}

}  // extern "C"
