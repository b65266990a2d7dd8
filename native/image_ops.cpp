// Native image preprocessing for the training input pipeline.
//
// The reference fed its TPUs with PIL (C) inside 4 torch DataLoader workers
// (pretrain_cambrian_8b.sh:52); with four towers, every sample needs four
// pad-to-square + resize + normalize passes and the Python/PIL overhead
// becomes the input bottleneck at pod scale (SURVEY.md §7 hard-part 5).
//
// This library implements the preprocessing contract of mm_utils.process_images
// (expand-to-square with per-tower mean fill, PIL-style adaptive-support
// bilinear/bicubic resampling, (x/255 - mean)/std normalization, HWC->CHW)
// as a thread-parallel C++ kernel driven via ctypes.
//
// Resampling matches PIL's convolution resampler (separable, support scaled
// by the downscale factor => antialiased), computed in float32.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kChannels = 3;

struct Filter {
  double support;
  double (*fn)(double);
};

double bilinear_filter(double x) {
  x = std::abs(x);
  return x < 1.0 ? 1.0 - x : 0.0;
}

// Catmull-Rom cubic, a = -0.5 (PIL's BICUBIC)
double bicubic_filter(double x) {
  constexpr double a = -0.5;
  x = std::abs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

const Filter kFilters[] = {
    {1.0, bilinear_filter},  // 0
    {2.0, bicubic_filter},   // 1
};

// Precompute the convolution bounds+weights for one axis (PIL semantics).
void precompute_coeffs(int in_size, int out_size, const Filter& filter,
                       std::vector<int>& bounds, std::vector<double>& weights,
                       int& ksize) {
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = std::max(scale, 1.0);
  const double support = filter.support * filterscale;
  ksize = static_cast<int>(std::ceil(support)) * 2 + 1;

  bounds.resize(out_size * 2);
  weights.assign(static_cast<size_t>(out_size) * ksize, 0.0);

  for (int xx = 0; xx < out_size; ++xx) {
    const double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;

    double* w = &weights[static_cast<size_t>(xx) * ksize];
    double total = 0.0;
    for (int k = 0; k < xmax; ++k) {
      double val = filter.fn((k + xmin - center + 0.5) / filterscale);
      w[k] = val;
      total += val;
    }
    if (total != 0.0) {
      for (int k = 0; k < xmax; ++k) w[k] /= total;
    }
    bounds[xx * 2] = xmin;
    bounds[xx * 2 + 1] = xmax;
  }
}

// Horizontal pass: [h, in_w, 3] f32 -> [h, out_w, 3] f32
void resample_horizontal(const float* src, int h, int in_w, float* dst,
                         int out_w, const std::vector<int>& bounds,
                         const std::vector<double>& weights, int ksize) {
  for (int y = 0; y < h; ++y) {
    const float* row = src + static_cast<size_t>(y) * in_w * kChannels;
    float* out_row = dst + static_cast<size_t>(y) * out_w * kChannels;
    for (int x = 0; x < out_w; ++x) {
      const int xmin = bounds[x * 2];
      const int xmax = bounds[x * 2 + 1];
      const double* w = &weights[static_cast<size_t>(x) * ksize];
      double acc[kChannels] = {0, 0, 0};
      for (int k = 0; k < xmax; ++k) {
        const float* px = row + static_cast<size_t>(xmin + k) * kChannels;
        acc[0] += px[0] * w[k];
        acc[1] += px[1] * w[k];
        acc[2] += px[2] * w[k];
      }
      float* out_px = out_row + static_cast<size_t>(x) * kChannels;
      out_px[0] = static_cast<float>(acc[0]);
      out_px[1] = static_cast<float>(acc[1]);
      out_px[2] = static_cast<float>(acc[2]);
    }
  }
}

// Vertical pass: [in_h, w, 3] f32 -> [out_h, w, 3] f32
void resample_vertical(const float* src, int in_h, int w, float* dst,
                       int out_h, const std::vector<int>& bounds,
                       const std::vector<double>& weights, int ksize) {
  for (int y = 0; y < out_h; ++y) {
    const int ymin = bounds[y * 2];
    const int ymax = bounds[y * 2 + 1];
    const double* wt = &weights[static_cast<size_t>(y) * ksize];
    float* out_row = dst + static_cast<size_t>(y) * w * kChannels;
    std::vector<double> acc(static_cast<size_t>(w) * kChannels, 0.0);
    for (int k = 0; k < ymax; ++k) {
      const float* row = src + static_cast<size_t>(ymin + k) * w * kChannels;
      const double wk = wt[k];
      for (int i = 0; i < w * kChannels; ++i) acc[i] += row[i] * wk;
    }
    for (int i = 0; i < w * kChannels; ++i)
      out_row[i] = static_cast<float>(acc[i]);
  }
}

// Full per-image pipeline. src: u8 HWC [src_h, src_w, 3].
// dst: f32 CHW [3, target, target].
void preprocess_one(const uint8_t* src, int src_h, int src_w,
                    const uint8_t* fill_rgb, int target, int resample,
                    const float* mean, const float* stddev, float* dst) {
  // 1. expand to square with fill color, centering (mm_utils.expand2square)
  const int side = std::max(src_h, src_w);
  std::vector<float> square(static_cast<size_t>(side) * side * kChannels);
  {
    const float fr = fill_rgb[0], fg = fill_rgb[1], fb = fill_rgb[2];
    for (size_t i = 0; i < square.size(); i += kChannels) {
      square[i] = fr;
      square[i + 1] = fg;
      square[i + 2] = fb;
    }
    const int off_y = (side - src_h) / 2;
    const int off_x = (side - src_w) / 2;
    for (int y = 0; y < src_h; ++y) {
      float* drow =
          &square[(static_cast<size_t>(y + off_y) * side + off_x) * kChannels];
      const uint8_t* srow = src + static_cast<size_t>(y) * src_w * kChannels;
      for (int i = 0; i < src_w * kChannels; ++i)
        drow[i] = static_cast<float>(srow[i]);
    }
  }

  // 2. separable resample side -> target
  const Filter& filter = kFilters[resample == 1 ? 1 : 0];
  std::vector<int> hb, vb;
  std::vector<double> hw, vw;
  int hks, vks;
  precompute_coeffs(side, target, filter, hb, hw, hks);
  precompute_coeffs(side, target, filter, vb, vw, vks);

  std::vector<float> tmp(static_cast<size_t>(side) * target * kChannels);
  resample_horizontal(square.data(), side, side, tmp.data(), target, hb, hw, hks);
  // PIL materializes a u8 image after each pass; mirror its rounding so the
  // native path is numerically interchangeable with the PIL path.
  for (auto& v : tmp) v = std::min(255.0f, std::max(0.0f, std::round(v)));
  std::vector<float> resized(static_cast<size_t>(target) * target * kChannels);
  resample_vertical(tmp.data(), side, target, resized.data(), target, vb, vw, vks);

  // 3. u8 rounding/clamp (PIL materializes a u8 image), normalize, HWC->CHW
  const size_t plane = static_cast<size_t>(target) * target;
  for (int y = 0; y < target; ++y) {
    for (int x = 0; x < target; ++x) {
      const float* px = &resized[(static_cast<size_t>(y) * target + x) * kChannels];
      const size_t idx = static_cast<size_t>(y) * target + x;
      for (int c = 0; c < kChannels; ++c) {
        float v = std::round(px[c]);
        v = std::min(255.0f, std::max(0.0f, v));
        dst[c * plane + idx] = (v / 255.0f - mean[c]) / stddev[c];
      }
    }
  }
}

}  // namespace

extern "C" {

// Batch API: n images (possibly different sizes) -> one tower's tensors.
//   srcs:      array of n pointers to u8 HWC images
//   heights/widths: per-image dims
//   fill_rgb:  3 u8 (per-tower mean * 255)
//   target:    output side
//   resample:  0 bilinear, 1 bicubic
//   mean/std:  3 floats
//   out:       n * 3 * target * target f32 (contiguous NCHW)
//   num_threads: worker threads (<=0 => hardware concurrency)
void preprocess_batch(const uint8_t** srcs, const int* heights,
                      const int* widths, int n, const uint8_t* fill_rgb,
                      int target, int resample, const float* mean,
                      const float* stddev, float* out, int num_threads) {
  if (num_threads <= 0) {
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 4;
  }
  num_threads = std::min(num_threads, n);
  const size_t image_elems = static_cast<size_t>(kChannels) * target * target;

  std::atomic<int> next(0);
  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      preprocess_one(srcs[i], heights[i], widths[i], fill_rgb, target,
                     resample, mean, stddev, out + image_elems * i);
    }
  };
  if (num_threads <= 1) {
    worker();
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

// Single-image convenience entry.
void preprocess_image(const uint8_t* src, int src_h, int src_w,
                      const uint8_t* fill_rgb, int target, int resample,
                      const float* mean, const float* stddev, float* out) {
  preprocess_one(src, src_h, src_w, fill_rgb, target, resample, mean, stddev,
                 out);
}

}  // extern "C"
