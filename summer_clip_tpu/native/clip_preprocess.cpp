// Native host preprocessing for the feature-extraction pipeline.
//
// The TPU side of save_features sustains thousands of images/sec; PIL-based
// per-image decode cannot feed it. This library implements the CLIP eval
// transform end-to-end in C++ (reference semantics:
// torchvision Resize(bicubic, shorter->S) + CenterCrop(S) + Normalize):
//
//   JPEG bytes --libjpeg (DCT-scaled)--> RGB
//            --bicubic shorter-side resize--> (>=S x >=S)
//            --center crop S--> normalize (CLIP mean/std) --> float32 HWC
//
// A pthread worker pool decodes a whole batch in parallel straight into the
// caller's pinned output buffer, so Python only does pointer passing.
// Exposed via a C ABI for ctypes (no pybind11 dependency).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr float kMean[3] = {0.48145466f, 0.4578275f, 0.40821073f};
constexpr float kStd[3] = {0.26862954f, 0.26130258f, 0.27577711f};

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void ErrorExit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG from memory into an RGB byte image. Uses libjpeg's DCT
// scaling to avoid decoding full resolution when the target is much smaller.
bool DecodeJpeg(const uint8_t* data, size_t len, int target_short, int fast,
                std::vector<uint8_t>* out, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = ErrorExit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;

  // pick the smallest DCT scale that keeps the short side >= 2x the target
  // (headroom so the bicubic pass controls final quality). fast mode only
  // requires >= 1x: e.g. 480x640 -> 224 decodes at 1/2 resolution (4x fewer
  // pixels through the IDCT; libjpeg's scaled IDCT is itself a low-pass, so
  // quality loss vs the full decode is small -- measured in bench_loader).
  int short_side = std::min<int>(cinfo.image_width, cinfo.image_height);
  const int margin = fast ? 1 : 2;
  int denom = 1;
  while (denom < 8 && target_short > 0 &&
         short_side / (denom * 2) >= margin * target_short) {
    denom *= 2;
  }
  cinfo.scale_num = 1;
  cinfo.scale_denom = denom;

  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  out->resize(static_cast<size_t>(*w) * (*h) * 3);
  const int stride = (*w) * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

inline float CubicKernel(float x) {
  // Catmull-Rom style cubic with a = -0.5 (PIL's bicubic kernel)
  constexpr float a = -0.5f;
  x = std::fabs(x);
  if (x < 1.0f) return ((a + 2.0f) * x - (a + 3.0f)) * x * x + 1.0f;
  if (x < 2.0f) return (((x - 5.0f) * x + 8.0f) * x - 4.0f) * a;
  return 0.0f;
}

// Precompute antialiased convolution taps for one axis (PIL-style: the
// kernel support scales with the downscale factor so frequencies above the
// target Nyquist are filtered, not aliased).
void BuildTaps(int in_size, int out_size, std::vector<int>* starts,
               std::vector<float>* weights, int* ntaps) {
  const double scale = static_cast<double>(in_size) / out_size;
  const double filter_scale = std::max(scale, 1.0);
  const double support = 2.0 * filter_scale;  // bicubic support = 2
  *ntaps = static_cast<int>(std::ceil(support)) * 2 + 1;
  starts->assign(out_size, 0);
  weights->assign(static_cast<size_t>(out_size) * (*ntaps), 0.0f);
  for (int x = 0; x < out_size; ++x) {
    const double center = (x + 0.5) * scale - 0.5;
    int start = static_cast<int>(std::floor(center - support)) + 1;
    start = std::clamp(start, 0, std::max(in_size - *ntaps, 0));
    (*starts)[x] = start;
    double wsum = 0.0;
    float* w = weights->data() + static_cast<size_t>(x) * (*ntaps);
    for (int k = 0; k < *ntaps; ++k) {
      int xx = start + k;
      if (xx >= in_size) break;
      double wgt = CubicKernel(static_cast<float>((center - xx) / filter_scale));
      w[k] = static_cast<float>(wgt);
      wsum += wgt;
    }
    if (wsum != 0.0) {
      for (int k = 0; k < *ntaps; ++k) w[k] = static_cast<float>(w[k] / wsum);
    }
  }
}

// Separable antialiased bicubic resize of an RGB byte image.
void ResizeBicubic(const uint8_t* src, int sw, int sh, float* dst, int dw, int dh) {
  std::vector<int> xs, ys;
  std::vector<float> xw, yw;
  int xt = 0, yt = 0;
  BuildTaps(sw, dw, &xs, &xw, &xt);
  BuildTaps(sh, dh, &ys, &yw, &yt);

  // horizontal pass into a temp (sh x dw x 3) buffer
  std::vector<float> tmp(static_cast<size_t>(sh) * dw * 3);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* srow = src + static_cast<size_t>(y) * sw * 3;
    float* trow = tmp.data() + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const float* w = xw.data() + static_cast<size_t>(x) * xt;
      const int start = xs[x];
      float acc[3] = {0, 0, 0};
      const int kmax = std::min(xt, sw - start);
      for (int k = 0; k < kmax; ++k) {
        const uint8_t* px = srow + (start + k) * 3;
        acc[0] += w[k] * px[0];
        acc[1] += w[k] * px[1];
        acc[2] += w[k] * px[2];
      }
      trow[x * 3 + 0] = acc[0];
      trow[x * 3 + 1] = acc[1];
      trow[x * 3 + 2] = acc[2];
    }
  }
  // vertical pass
  for (int y = 0; y < dh; ++y) {
    const float* w = yw.data() + static_cast<size_t>(y) * yt;
    const int start = ys[y];
    const int kmax = std::min(yt, sh - start);
    float* drow = dst + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      for (int c = 0; c < 3; ++c) {
        float acc = 0.0f;
        for (int k = 0; k < kmax; ++k) {
          acc += w[k] * tmp[(static_cast<size_t>(start + k) * dw + x) * 3 + c];
        }
        drow[x * 3 + c] = acc;
      }
    }
  }
}

// Full eval transform for one image file -> normalized float32 (S, S, 3).
bool PreprocessFile(const char* path, int out_size, int fast, float* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long len = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> bytes(static_cast<size_t>(len));
  size_t got = std::fread(bytes.data(), 1, bytes.size(), f);
  std::fclose(f);
  if (got != bytes.size()) return false;

  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  if (!DecodeJpeg(bytes.data(), bytes.size(), out_size, fast, &rgb, &w, &h)) return false;

  // shorter-side resize
  int rw, rh;
  if (w <= h) {
    rw = out_size;
    rh = std::max(1, static_cast<int>(std::lround(
        static_cast<double>(h) * out_size / w)));
  } else {
    rh = out_size;
    rw = std::max(1, static_cast<int>(std::lround(
        static_cast<double>(w) * out_size / h)));
  }
  std::vector<float> resized(static_cast<size_t>(rw) * rh * 3);
  ResizeBicubic(rgb.data(), w, h, resized.data(), rw, rh);

  // center crop + normalize
  const int left = (rw - out_size) / 2;
  const int top = (rh - out_size) / 2;
  for (int y = 0; y < out_size; ++y) {
    const float* srow = resized.data() + (static_cast<size_t>(y + top) * rw + left) * 3;
    float* drow = out + static_cast<size_t>(y) * out_size * 3;
    for (int x = 0; x < out_size; ++x) {
      for (int c = 0; c < 3; ++c) {
        float v = std::clamp(srow[x * 3 + c], 0.0f, 255.0f) / 255.0f;
        drow[x * 3 + c] = (v - kMean[c]) / kStd[c];
      }
    }
  }
  return true;
}

}  // namespace

extern "C" {

// Decode+preprocess a batch of image files in parallel.
// paths: array of n C strings; out: (n, out_size, out_size, 3) float32;
// ok: (n,) uint8 success flags; fast: relax the DCT-scale margin to 1x
// (see DecodeJpeg). Returns number of successes.
int clip_preprocess_batch(const char** paths, int n, int out_size,
                          float* out, uint8_t* ok, int num_threads,
                          int fast) {
  if (num_threads <= 0) {
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 4;
  }
  num_threads = std::min(num_threads, n > 0 ? n : 1);
  std::atomic<int> next(0);
  std::atomic<int> successes(0);
  const size_t stride = static_cast<size_t>(out_size) * out_size * 3;

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      bool good = PreprocessFile(paths[i], out_size, fast, out + stride * i);
      ok[i] = good ? 1 : 0;
      if (good) successes.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return successes.load();
}

// Single-image variant (for tests / fallbacks).
int clip_preprocess_one(const char* path, int out_size, float* out) {
  return PreprocessFile(path, out_size, /*fast=*/0, out) ? 1 : 0;
}

}  // extern "C"
