// Native data-loader core: fused batch packing.
//
// The hot host-side loop of the input pipeline (the analogue of the
// reference's C++ MegEngine DataLoader + DetectionPadCollator,
// data/collators/pad_collator.py:23-106) is "pad B variable-size HWC
// images into one static-shape NHWC canvas". Done in numpy that is two
// full passes over the canvas (np.full fill, then per-image slice copy);
// here it is one pass — each output row is either a memcpy of the source
// row plus a fill of the tail, or a pure fill — parallelized over
// (batch, row) with OpenMP. Also emits the DETR per-pixel valid mask in
// the same pass when requested.
//
// Built by basedet_tpu/native/build.py with g++ -O3 -fopenmp; called via
// ctypes (no pybind11 in the image). All functions return 0 on success.

#include <cstdint>
#include <cstring>
#include <algorithm>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

template <typename T>
int pack_batch(const T* const* imgs, const int32_t* hw, int64_t B,
               int64_t H, int64_t W, int64_t C, T pad, T* out,
               uint8_t* mask_out) {
  if (B < 0 || H <= 0 || W <= 0 || C <= 0) return 1;
  const int64_t row = W * C;
  const int64_t img_stride = H * row;
#if defined(_OPENMP)
#pragma omp parallel for collapse(2) schedule(static)
#endif
  for (int64_t b = 0; b < B; ++b) {
    for (int64_t y = 0; y < H; ++y) {
      const int64_t h = hw[2 * b];
      const int64_t w = hw[2 * b + 1];
      T* dst = out + b * img_stride + y * row;
      if (y < h) {
        const T* src = imgs[b] + y * w * C;
        std::memcpy(dst, src, sizeof(T) * w * C);
        std::fill(dst + w * C, dst + row, pad);
      } else {
        std::fill(dst, dst + row, pad);
      }
      if (mask_out != nullptr) {
        uint8_t* m = mask_out + b * H * W + y * W;
        if (y < h) {
          std::memset(m, 1, (size_t)w);
          std::memset(m + w, 0, (size_t)(W - w));
        } else {
          std::memset(m, 0, (size_t)W);
        }
      }
    }
  }
  return 0;
}

}  // namespace

extern "C" {

int pack_batch_u8(const uint8_t* const* imgs, const int32_t* hw, int64_t B,
                  int64_t H, int64_t W, int64_t C, uint8_t pad, uint8_t* out,
                  uint8_t* mask_out) {
  return pack_batch<uint8_t>(imgs, hw, B, H, W, C, pad, out, mask_out);
}

int pack_batch_f32(const float* const* imgs, const int32_t* hw, int64_t B,
                   int64_t H, int64_t W, int64_t C, float pad, float* out,
                   uint8_t* mask_out) {
  return pack_batch<float>(imgs, hw, B, H, W, C, pad, out, mask_out);
}

int native_num_threads() {
#if defined(_OPENMP)
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
