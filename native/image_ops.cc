// Native host-side image preprocessing for aria-tpu.
//
// Plays the role the reference delegates to PIL/torchvision C ops and decord
// (SURVEY.md §2.3): bicubic resize (PIL-compatible separable resampling,
// a = -0.5 cubic, premultiplied coefficient tables), and a fused
// pad + normalize + HWC->CHW conversion that writes the float32 tensor the
// vision tower consumes. OpenMP-free, thread-safe, C ABI for ctypes.
//
// Build: g++ -O3 -shared -fPIC image_ops.cc spm_ops.cc -o libaria_native.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// PIL's bicubic kernel (a = -0.5), support = 2.
inline double bicubic(double x) {
  constexpr double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

struct CoeffTable {
  int ksize;                  // taps per output element
  std::vector<int> bounds;    // [out, 2]: (xmin, xcount)
  std::vector<double> coeffs; // [out, ksize]
};

// Mirrors PIL ImagingResample's precompute_coeffs.
CoeffTable precompute(int in_size, int out_size) {
  CoeffTable t;
  const double support_base = 2.0;  // bicubic support
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = support_base * filterscale;
  int ksize = static_cast<int>(std::ceil(support)) * 2 + 1;

  t.ksize = ksize;
  t.bounds.resize(out_size * 2);
  t.coeffs.assign(static_cast<size_t>(out_size) * ksize, 0.0);

  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    double ww = 0.0;
    double ss = 1.0 / filterscale;
    int xmin = static_cast<int>(std::max(0.0, std::floor(center - support)));
    int xmax = static_cast<int>(std::min(static_cast<double>(in_size),
                                         std::ceil(center + support)));
    xmax -= xmin;
    double* k = &t.coeffs[static_cast<size_t>(xx) * ksize];
    int x = 0;
    for (; x < xmax; ++x) {
      double w = bicubic((x + xmin - center + 0.5) * ss);
      k[x] = w;
      ww += w;
    }
    for (x = 0; x < xmax; ++x) {
      if (ww != 0.0) k[x] /= ww;
    }
    for (; x < ksize; ++x) k[x] = 0.0;
    t.bounds[xx * 2 + 0] = xmin;
    t.bounds[xx * 2 + 1] = xmax;
  }
  return t;
}

// PIL's 8-bit fixed-point resampling: coefficients quantized to
// round(k * 2^22), int32 accumulation with rounding bias, per-pass uint8
// clipping — bit-exact with Pillow's ImagingResample for uint8 images.
constexpr int kPrecisionBits = 32 - 8 - 2;

inline uint8_t clip8_fixed(int64_t acc) {
  int64_t v = acc >> kPrecisionBits;
  if (v < 0) return 0;
  if (v > 255) return 255;
  return static_cast<uint8_t>(v);
}

std::vector<int32_t> quantize(const CoeffTable& t, int out_size) {
  std::vector<int32_t> kk(static_cast<size_t>(out_size) * t.ksize);
  for (size_t i = 0; i < kk.size(); ++i) {
    double w = t.coeffs[i];
    kk[i] = static_cast<int32_t>(
        w < 0 ? -0.5 + w * (1 << kPrecisionBits) : 0.5 + w * (1 << kPrecisionBits));
  }
  return kk;
}

}  // namespace

extern "C" {

// Bicubic resize of an interleaved RGB (or any C-channel) uint8 image.
// src: [sh, sw, ch], dst: [dh, dw, ch].
void aria_resize_bicubic(const uint8_t* src, int sh, int sw, int ch,
                         uint8_t* dst, int dh, int dw) {
  CoeffTable hx = precompute(sw, dw);
  CoeffTable vy = precompute(sh, dh);
  std::vector<int32_t> hk = quantize(hx, dw);
  std::vector<int32_t> vk = quantize(vy, dh);
  const int64_t bias = 1LL << (kPrecisionBits - 1);

  // Horizontal pass into a uint8 intermediate [sh, dw, ch] (PIL quantizes
  // between passes).
  std::vector<uint8_t> tmp(static_cast<size_t>(sh) * dw * ch);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* srow = src + static_cast<size_t>(y) * sw * ch;
    uint8_t* trow = &tmp[static_cast<size_t>(y) * dw * ch];
    for (int x = 0; x < dw; ++x) {
      int xmin = hx.bounds[x * 2 + 0];
      int xcount = hx.bounds[x * 2 + 1];
      const int32_t* k = &hk[static_cast<size_t>(x) * hx.ksize];
      for (int c = 0; c < ch; ++c) {
        int64_t acc = bias;
        for (int i = 0; i < xcount; ++i)
          acc += static_cast<int64_t>(srow[(xmin + i) * ch + c]) * k[i];
        trow[x * ch + c] = clip8_fixed(acc);
      }
    }
  }

  // Vertical pass.
  for (int y = 0; y < dh; ++y) {
    int ymin = vy.bounds[y * 2 + 0];
    int ycount = vy.bounds[y * 2 + 1];
    const int32_t* k = &vk[static_cast<size_t>(y) * vy.ksize];
    uint8_t* drow = dst + static_cast<size_t>(y) * dw * ch;
    for (int x = 0; x < dw; ++x) {
      for (int c = 0; c < ch; ++c) {
        int64_t acc = bias;
        for (int i = 0; i < ycount; ++i)
          acc += static_cast<int64_t>(
                     tmp[(static_cast<size_t>(ymin + i) * dw + x) * ch + c]) * k[i];
        drow[x * ch + c] = clip8_fixed(acc);
      }
    }
  }
}

// Fused pad (bottom/right, zeros) + normalize ((v/255 - mean)/std) +
// HWC uint8 -> CHW float32, plus the boolean pixel mask.
// src: [h, w, 3]; out: [3, size, size] float32; mask: [size, size] uint8.
void aria_pad_normalize_chw(const uint8_t* src, int h, int w, int size,
                            const float* mean, const float* std_,
                            float* out, uint8_t* mask) {
  const float inv255 = 1.0f / 255.0f;
  float inv_std[3] = {1.0f / std_[0], 1.0f / std_[1], 1.0f / std_[2]};
  // zero-fill (padding regions normalize to (0 - mean)/std AFTER ToTensor in
  // the reference, but padding happens on the uint8 image BEFORE normalize —
  // so padded pixels are value 0 -> (0/255 - mean)/std).
  for (int c = 0; c < 3; ++c) {
    float pad_val = (0.0f - mean[c]) * inv_std[c];
    float* plane = out + static_cast<size_t>(c) * size * size;
    std::fill(plane, plane + static_cast<size_t>(size) * size, pad_val);
  }
  std::memset(mask, 0, static_cast<size_t>(size) * size);

  for (int y = 0; y < h; ++y) {
    const uint8_t* srow = src + static_cast<size_t>(y) * w * 3;
    for (int x = 0; x < w; ++x) {
      for (int c = 0; c < 3; ++c) {
        out[(static_cast<size_t>(c) * size + y) * size + x] =
            (srow[x * 3 + c] * inv255 - mean[c]) * inv_std[c];
      }
      mask[static_cast<size_t>(y) * size + x] = 1;
    }
  }
}

}  // extern "C"
