// Native host-side ray sampler for the data loader.
//
// The per-image pixel sampling + ray construction loop (reference
// BaseH5Dataset.sample_pixels / get_rays, core/dataset.py:277-434) is the
// data pipeline's hot path: for every training batch it scans sampling
// masks, draws pixels, gathers RGB/mask values and builds ray directions.
// The Python/numpy version costs several ms per batch on one host core;
// this C++ version does the scan/draw/gather in one pass, exposed through
// a plain C ABI consumed via ctypes (no pybind11 in the image).
//
// Build: csrc/build.sh -> posegen_tpu/lib/libposegen_host.so

#include <cstdint>
#include <cstring>
#include <cmath>

namespace {

// xoshiro256** — small, fast, seedable PRNG (public-domain algorithm)
struct Rng {
  uint64_t s[4];
  explicit Rng(uint64_t seed) {
    // splitmix64 expansion
    uint64_t x = seed;
    for (int i = 0; i < 4; ++i) {
      x += 0x9e3779b97f4a7c15ULL;
      uint64_t z = x;
      z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
      z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
      s[i] = z ^ (z >> 31);
    }
  }
  static inline uint64_t rotl(uint64_t v, int k) {
    return (v << k) | (v >> (64 - k));
  }
  inline uint64_t next() {
    const uint64_t result = rotl(s[1] * 5, 7) * 9;
    const uint64_t t = s[1] << 17;
    s[2] ^= s[0];
    s[3] ^= s[1];
    s[1] ^= s[2];
    s[0] ^= s[3];
    s[2] ^= t;
    s[3] = rotl(s[3], 45);
    return result;
  }
  inline uint64_t below(uint64_t n) { return next() % n; }
};

}  // namespace

extern "C" {

// Count valid (> 0) pixels in a mask and optionally collect their flat
// indices. Returns the count; indices written only when out != nullptr.
int64_t pg_scan_mask(const uint8_t* mask, int64_t n_pixels, int64_t* out) {
  int64_t cnt = 0;
  for (int64_t i = 0; i < n_pixels; ++i) {
    if (mask[i] > 0) {
      if (out) out[cnt] = i;
      ++cnt;
    }
  }
  return cnt;
}

// Draw n_rays flat pixel indices from the valid set of `mask`
// ((H*W,) uint8), with replacement iff fewer valid pixels than requested.
// Scratch must hold n_pixels int64. Returns number of valid pixels found.
int64_t pg_sample_pixels(const uint8_t* mask, int64_t n_pixels,
                         int64_t n_rays, uint64_t seed,
                         int64_t* scratch, int64_t* out_idx) {
  int64_t n_valid = pg_scan_mask(mask, n_pixels, scratch);
  Rng rng(seed);
  if (n_valid == 0) {
    for (int64_t i = 0; i < n_rays; ++i)
      out_idx[i] = (int64_t)rng.below((uint64_t)n_pixels);
    return 0;
  }
  if (n_valid >= n_rays) {
    // partial Fisher-Yates: sample without replacement
    for (int64_t i = 0; i < n_rays; ++i) {
      int64_t j = i + (int64_t)rng.below((uint64_t)(n_valid - i));
      int64_t tmp = scratch[i];
      scratch[i] = scratch[j];
      scratch[j] = tmp;
      out_idx[i] = scratch[i];
    }
  } else {
    for (int64_t i = 0; i < n_rays; ++i)
      out_idx[i] = scratch[rng.below((uint64_t)n_valid)];
  }
  return n_valid;
}

// Gather sampled pixels into ray/target buffers in one pass.
//   img   (H*W, 3) uint8, mask (H*W,) uint8, bkgd (H*W, 3) uint8 or null
//   pix_dirs (H*W, 3) f32 camera-frame directions (pre-focal)
//   c2w   (12,) f32 row-major top-3x4 of the camera-to-world matrix
// Outputs (n, 3)/(n, 1) float32: rays_o, rays_d, target, fg, bg.
void pg_gather_rays(const int64_t* idx, int64_t n,
                    const uint8_t* img, const uint8_t* mask,
                    const uint8_t* bkgd,
                    const float* pix_dirs, const float* c2w,
                    float fx, float fy,
                    float* rays_o, float* rays_d,
                    float* target, float* fg, float* bg) {
  const float r00 = c2w[0], r01 = c2w[1], r02 = c2w[2], tx = c2w[3];
  const float r10 = c2w[4], r11 = c2w[5], r12 = c2w[6], ty = c2w[7];
  const float r20 = c2w[8], r21 = c2w[9], r22 = c2w[10], tz = c2w[11];
  const float inv255 = 1.0f / 255.0f;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t p = idx[i];
    const float dx = pix_dirs[p * 3 + 0] / fx;
    const float dy = pix_dirs[p * 3 + 1] / fy;
    const float dz = pix_dirs[p * 3 + 2];
    rays_d[i * 3 + 0] = r00 * dx + r01 * dy + r02 * dz;
    rays_d[i * 3 + 1] = r10 * dx + r11 * dy + r12 * dz;
    rays_d[i * 3 + 2] = r20 * dx + r21 * dy + r22 * dz;
    rays_o[i * 3 + 0] = tx;
    rays_o[i * 3 + 1] = ty;
    rays_o[i * 3 + 2] = tz;
    target[i * 3 + 0] = img[p * 3 + 0] * inv255;
    target[i * 3 + 1] = img[p * 3 + 1] * inv255;
    target[i * 3 + 2] = img[p * 3 + 2] * inv255;
    fg[i] = mask[p] > 0 ? 1.0f : 0.0f;
    if (bkgd) {
      bg[i * 3 + 0] = bkgd[p * 3 + 0] * inv255;
      bg[i * 3 + 1] = bkgd[p * 3 + 1] * inv255;
      bg[i * 3 + 2] = bkgd[p * 3 + 2] * inv255;
    } else {
      bg[i * 3 + 0] = bg[i * 3 + 1] = bg[i * 3 + 2] = 0.0f;
    }
  }
}

}  // extern "C"
