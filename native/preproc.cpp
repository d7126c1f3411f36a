// Native image-preprocessing runtime for the serving/data path.
//
// The reference delegates its data path to torch's native DataLoader
// workers; this is the framework's own native equivalent: multi-threaded
// bicubic resize + center-crop + normalize producing NHWC float32 batches,
// exposed through a C ABI consumed via ctypes (ivit_tpu/utils/native.py).
//
// Build: make -C native   (produces libivit_preproc.so)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline float cubic_weight(float t) {
  // Catmull-Rom (a = -0.5), matching PIL's bicubic kernel family
  const float a = -0.5f;
  t = std::fabs(t);
  if (t <= 1.0f) return ((a + 2.0f) * t - (a + 3.0f)) * t * t + 1.0f;
  if (t < 2.0f) return (((t - 5.0f) * t + 8.0f) * t - 4.0f) * a;
  return 0.0f;
}

// Precomputed per-output-pixel resample coefficients (PIL-style): for
// downscaling the kernel support widens by the scale factor (antialiasing).
struct ResampleCoeffs {
  int taps;                  // taps per output pixel
  std::vector<int> first;    // first source index per output pixel
  std::vector<float> weight; // [out, taps] normalized weights
};

ResampleCoeffs make_coeffs(int src_size, int dst_size) {
  const float scale = static_cast<float>(src_size) / dst_size;
  const float filterscale = std::max(scale, 1.0f);
  const float support = 2.0f * filterscale;   // bicubic support = 2
  const int taps = static_cast<int>(std::ceil(support)) * 2 + 1;

  ResampleCoeffs rc;
  rc.taps = taps;
  rc.first.resize(dst_size);
  rc.weight.assign(static_cast<size_t>(dst_size) * taps, 0.0f);
  for (int x = 0; x < dst_size; ++x) {
    const float center = (x + 0.5f) * scale;
    int lo = static_cast<int>(center - support + 0.5f);
    int hi = static_cast<int>(center + support + 0.5f);
    lo = std::max(lo, 0);
    hi = std::min(hi, src_size);
    rc.first[x] = lo;
    float sum = 0.0f;
    for (int i = lo; i < hi; ++i) {
      const float w =
          cubic_weight((i - center + 0.5f) / filterscale);
      rc.weight[static_cast<size_t>(x) * taps + (i - lo)] = w;
      sum += w;
    }
    if (sum != 0.0f) {
      for (int k = 0; k < hi - lo; ++k)
        rc.weight[static_cast<size_t>(x) * taps + k] /= sum;
    }
  }
  return rc;
}

// antialiased bicubic resize uint8 HWC -> float HWC (values still 0..255)
void resize_bicubic(const uint8_t* src, int sh, int sw, int c, float* dst,
                    int dh, int dw) {
  const ResampleCoeffs cx = make_coeffs(sw, dw);
  const ResampleCoeffs cy = make_coeffs(sh, dh);
  std::vector<float> tmp(static_cast<size_t>(sh) * dw * c);

  // horizontal pass
  for (int y = 0; y < sh; ++y) {
    const uint8_t* srow = src + static_cast<size_t>(y) * sw * c;
    float* trow = tmp.data() + static_cast<size_t>(y) * dw * c;
    for (int x = 0; x < dw; ++x) {
      const int x0 = cx.first[x];
      const float* w = &cx.weight[static_cast<size_t>(x) * cx.taps];
      for (int ch = 0; ch < c; ++ch) {
        float acc = 0.0f;
        for (int k = 0; k < cx.taps; ++k) {
          const int xs = x0 + k;
          if (xs >= sw) break;
          acc += w[k] * srow[static_cast<size_t>(xs) * c + ch];
        }
        trow[static_cast<size_t>(x) * c + ch] = acc;
      }
    }
  }
  // vertical pass
  for (int y = 0; y < dh; ++y) {
    const int y0 = cy.first[y];
    const float* w = &cy.weight[static_cast<size_t>(y) * cy.taps];
    float* drow = dst + static_cast<size_t>(y) * dw * c;
    for (int x = 0; x < dw; ++x) {
      for (int ch = 0; ch < c; ++ch) {
        float acc = 0.0f;
        for (int k = 0; k < cy.taps; ++k) {
          const int ys = y0 + k;
          if (ys >= sh) break;
          acc += w[k] * tmp[(static_cast<size_t>(ys) * dw + x) * c + ch];
        }
        drow[static_cast<size_t>(x) * c + ch] = acc;
      }
    }
  }
}

void preprocess_one(const uint8_t* img, int h, int w, int c, int out_size,
                    const float* mean, const float* std_, float* out) {
  // eval transform: resize shorter side to out_size/0.875, center-crop
  const int scale = static_cast<int>(out_size / 0.875f);
  int nh, nw;
  if (h < w) {
    nh = scale;
    nw = std::max(scale, static_cast<int>(std::lround(
        static_cast<float>(w) * scale / h)));
  } else {
    nw = scale;
    nh = std::max(scale, static_cast<int>(std::lround(
        static_cast<float>(h) * scale / w)));
  }
  std::vector<float> resized(static_cast<size_t>(nh) * nw * c);
  resize_bicubic(img, h, w, c, resized.data(), nh, nw);

  const int y0 = (nh - out_size) / 2;
  const int x0 = (nw - out_size) / 2;
  for (int y = 0; y < out_size; ++y) {
    const float* row = &resized[(static_cast<size_t>(y0 + y) * nw + x0) * c];
    float* orow = &out[static_cast<size_t>(y) * out_size * c];
    for (int x = 0; x < out_size; ++x) {
      for (int ch = 0; ch < c; ++ch) {
        const float v = row[static_cast<size_t>(x) * c + ch] / 255.0f;
        orow[static_cast<size_t>(x) * c + ch] = (v - mean[ch]) / std_[ch];
      }
    }
  }
}

}  // namespace

extern "C" {

// Batch eval-preprocess: `n` images, each h[i] x w[i] x 3 uint8 packed at
// offsets[i] in `data`; writes [n, out_size, out_size, 3] float32.
void ivit_preprocess_batch(const uint8_t* data, const int64_t* offsets,
                           const int32_t* heights, const int32_t* widths,
                           int32_t n, int32_t out_size, const float* mean,
                           const float* std_, float* out,
                           int32_t num_threads) {
  const size_t out_stride =
      static_cast<size_t>(out_size) * out_size * 3;
  std::atomic<int32_t> next(0);
  auto worker = [&]() {
    while (true) {
      const int32_t i = next.fetch_add(1);
      if (i >= n) return;
      preprocess_one(data + offsets[i], heights[i], widths[i], 3, out_size,
                     mean, std_, out + out_stride * i);
    }
  };
  const int nt = std::max(1, std::min<int>(num_threads, n));
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

// Single-image resize (bicubic) to [dh, dw, 3] float (0..255 scale).
void ivit_resize_bicubic(const uint8_t* src, int32_t h, int32_t w,
                         float* dst, int32_t dh, int32_t dw) {
  resize_bicubic(src, h, w, 3, dst, dh, dw);
}

}  // extern "C"
