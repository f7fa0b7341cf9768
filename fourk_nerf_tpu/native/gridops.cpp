// Native grid/render kernels (CPU).
//
// The reference implements its hot ops as CUDA kernels (lib/cuda/*.cu). The
// TPU compute path here is XLA/Pallas, but the runtime keeps a native C++
// implementation of the same op semantics for two jobs:
//   1. independent golden oracles for the JAX kernels' tests (bit-level
//      semantics of the reference: early termination, clamped TV, nearest
//      mask lookup, cumdist spacing scan);
//   2. fast host-side preprocessing (occupancy bookkeeping, ray bookkeeping)
//      off the accelerator.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).
// Build: fourk_nerf_tpu/native/build.sh (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Trilinear sampling with align-corners + zeros padding.
// grid: [X,Y,Z,C] row-major; ind01: [M,3] normalized coords; out: [M,C].
void trilinear_sample(const float* grid, int X, int Y, int Z, int C,
                      const float* ind01, int64_t M, float* out) {
  for (int64_t m = 0; m < M; ++m) {
    const float px = ind01[m * 3 + 0] * (X - 1);
    const float py = ind01[m * 3 + 1] * (Y - 1);
    const float pz = ind01[m * 3 + 2] * (Z - 1);
    const int x0 = (int)std::floor(px), y0 = (int)std::floor(py),
              z0 = (int)std::floor(pz);
    const float fx = px - x0, fy = py - y0, fz = pz - z0;
    float* o = out + m * C;
    std::memset(o, 0, sizeof(float) * C);
    for (int cx = 0; cx <= 1; ++cx)
      for (int cy = 0; cy <= 1; ++cy)
        for (int cz = 0; cz <= 1; ++cz) {
          const int ix = x0 + cx, iy = y0 + cy, iz = z0 + cz;
          if (ix < 0 || ix >= X || iy < 0 || iy >= Y || iz < 0 || iz >= Z)
            continue;  // zeros padding
          const float w = (cx ? fx : 1.f - fx) * (cy ? fy : 1.f - fy) *
                          (cz ? fz : 1.f - fz);
          const float* g = grid + (((int64_t)ix * Y + iy) * Z + iz) * C;
          for (int c = 0; c < C; ++c) o[c] += w * g[c];
        }
  }
}

// alpha -> weights with early termination at T < 1e-3
// (semantics of alpha2weight_cuda, render_utils_kernel.cu:576-605).
// alpha/valid: [N,K]; weights: [N,K]; alphainv_last: [N].
void alpha2weight(const float* alpha, const uint8_t* valid, int64_t N, int K,
                  float* weights, float* alphainv_last) {
  for (int64_t n = 0; n < N; ++n) {
    float t = 1.f;
    const float* a = alpha + n * K;
    const uint8_t* v = valid ? valid + n * K : nullptr;
    float* w = weights + n * K;
    std::memset(w, 0, sizeof(float) * K);
    for (int k = 0; k < K; ++k) {
      if (v && !v[k]) continue;  // dropped sample == alpha 0
      w[k] = t * a[k];
      t *= (1.f - a[k]);
      if (t < 1e-3f) break;
    }
    alphainv_last[n] = t;
  }
}

// Clamped 6-neighbor total-variation gradient
// (total_variation_add_grad_cuda semantics incl. its (z,y,x) <- (wx,wy,wz)
// weight-axis convention and the /6 pre-scale). grid/out: [X,Y,Z,C].
void tv_grad(const float* grid, int X, int Y, int Z, int C, float wx, float wy,
             float wz, const float* sparse_grad, float* out) {
  const float sx = wz / 6.f, sy = wy / 6.f, sz = wx / 6.f;
  const auto at = [&](int x, int y, int z, int c) -> float {
    return grid[(((int64_t)x * Y + y) * Z + z) * C + c];
  };
  const auto clamp1 = [](float v) { return std::max(-1.f, std::min(1.f, v)); };
  for (int x = 0; x < X; ++x)
    for (int y = 0; y < Y; ++y)
      for (int z = 0; z < Z; ++z)
        for (int c = 0; c < C; ++c) {
          const int64_t i = (((int64_t)x * Y + y) * Z + z) * C + c;
          if (sparse_grad && sparse_grad[i] == 0.f) {
            out[i] = 0.f;
            continue;
          }
          const float v = at(x, y, z, c);
          float g = 0.f;
          if (x > 0) g += sx * clamp1(v - at(x - 1, y, z, c));
          if (x < X - 1) g += sx * clamp1(v - at(x + 1, y, z, c));
          if (y > 0) g += sy * clamp1(v - at(x, y - 1, z, c));
          if (y < Y - 1) g += sy * clamp1(v - at(x, y + 1, z, c));
          if (z > 0) g += sz * clamp1(v - at(x, y, z - 1, c));
          if (z < Z - 1) g += sz * clamp1(v - at(x, y, z + 1, c));
          out[i] = g;
        }
}

// Nearest-neighbor boolean occupancy lookup (maskcache_lookup_cuda).
// mask: [X,Y,Z] uint8; xyz: [M,3] world coords.
void mask_lookup(const uint8_t* mask, int X, int Y, int Z, const float* xyz,
                 const float* xyz_min, const float* xyz_max, int64_t M,
                 uint8_t* out) {
  const float sx = (X - 1) / (xyz_max[0] - xyz_min[0]);
  const float sy = (Y - 1) / (xyz_max[1] - xyz_min[1]);
  const float sz = (Z - 1) / (xyz_max[2] - xyz_min[2]);
  for (int64_t m = 0; m < M; ++m) {
    const int i = (int)std::lround((xyz[m * 3 + 0] - xyz_min[0]) * sx);
    const int j = (int)std::lround((xyz[m * 3 + 1] - xyz_min[1]) * sy);
    const int k = (int)std::lround((xyz[m * 3 + 2] - xyz_min[2]) * sz);
    out[m] = (i >= 0 && i < X && j >= 0 && j < Y && k >= 0 && k < Z)
                 ? mask[((int64_t)i * Y + j) * Z + k]
                 : 0;
  }
}

// Cumulative-distance spacing filter (cumdist_thres_cuda semantics).
// dist: [N,K]; out mask: [N,K].
void cumdist_thres(const float* dist, int64_t N, int K, float thres,
                   uint8_t* out) {
  for (int64_t n = 0; n < N; ++n) {
    float cum = 0.f;
    for (int k = 0; k < K; ++k) {
      cum += dist[n * K + k];
      const bool over = cum > thres;
      if (over) cum = 0.f;
      out[n * K + k] = over;
    }
  }
}

// MaskedAdam update (adam_upd_kernel.cu semantics): in-place on param/m/v.
// mode: 0 plain, 1 skip-zero-grad, 2 per-element lr (perlr array).
void adam_step(float* param, const float* grad, float* m, float* v,
               const float* perlr, int64_t N, int step, float beta1,
               float beta2, float lr, float eps, int mode) {
  const float step_size =
      lr * std::sqrt(1.f - std::pow(beta2, (float)step)) /
      (1.f - std::pow(beta1, (float)step));
  for (int64_t i = 0; i < N; ++i) {
    if (mode == 1 && grad[i] == 0.f) continue;
    m[i] = beta1 * m[i] + (1.f - beta1) * grad[i];
    v[i] = beta2 * v[i] + (1.f - beta2) * grad[i] * grad[i];
    float d = step_size * m[i] / (std::sqrt(v[i]) + eps);
    if (mode == 2) d *= perlr[i];
    param[i] -= d;
  }
}

}  // extern "C"
