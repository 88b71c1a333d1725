// Native host-side kernels for gaussctrl_tpu.
//
// The reference's host data path leans on OpenCV (C++) for per-view
// undistortion (/root/reference/gaussctrl/gc_datamanager.py:112-186) and on
// simple_knn (CUDA) inside splatfacto for seed-scale estimation. These are
// the equivalent native components for the TPU framework's host runtime:
//
//   undistort_f32   — OPENCV-model (k1..k4, p1, p2) undistortion with output
//                     intrinsics == input intrinsics, bilinear sampling,
//                     multithreaded over rows.
//   resize_bilinear — float image resize (artifact cache resampling).
//   knn_mean_dist   — mean distance to the k nearest neighbours via a
//                     uniform-grid hash (seed scales for 3DGS init; the
//                     simple_knn role), multithreaded over points.
//
// Built as a shared library (see Makefile); bound via ctypes from
// gaussctrl_tpu/native/__init__.py.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

int hw_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n == 0 ? 4 : static_cast<int>(n);
}

template <typename F>
void parallel_for(int64_t n, F body) {
  int nt = hw_threads();
  if (n < 1024 || nt <= 1) {
    for (int64_t i = 0; i < n; ++i) body(i);
    return;
  }
  std::vector<std::thread> threads;
  std::atomic<int64_t> next(0);
  const int64_t chunk = (n + nt * 8 - 1) / (nt * 8);
  for (int t = 0; t < nt; ++t) {
    threads.emplace_back([&] {
      for (;;) {
        int64_t lo = next.fetch_add(chunk);
        if (lo >= n) return;
        int64_t hi = std::min(lo + chunk, n);
        for (int64_t i = lo; i < hi; ++i) body(i);
      }
    });
  }
  for (auto& th : threads) th.join();
}

inline float sample_bilinear(const float* img, int h, int w, int c,
                             float x, float y, int ch) {
  if (x < 0 || y < 0 || x > w - 1 || y > h - 1) return 0.0f;
  int x0 = static_cast<int>(x), y0 = static_cast<int>(y);
  int x1 = std::min(x0 + 1, w - 1), y1 = std::min(y0 + 1, h - 1);
  float fx = x - x0, fy = y - y0;
  const float* p00 = img + (static_cast<int64_t>(y0) * w + x0) * c + ch;
  const float* p01 = img + (static_cast<int64_t>(y0) * w + x1) * c + ch;
  const float* p10 = img + (static_cast<int64_t>(y1) * w + x0) * c + ch;
  const float* p11 = img + (static_cast<int64_t>(y1) * w + x1) * c + ch;
  return (*p00) * (1 - fx) * (1 - fy) + (*p01) * fx * (1 - fy) +
         (*p10) * (1 - fx) * fy + (*p11) * fx * fy;
}

}  // namespace

extern "C" {

// OPENCV radial(k1..k4)/tangential(p1,p2) undistortion. dist6 order matches
// the nerfstudio transforms.json fields: (k1, k2, k3, k4, p1, p2).
// src/dst are [h, w, c] float32 row-major; intrinsics fx, fy, cx, cy are
// unchanged by the operation (newK == K).
void undistort_f32(const float* src, int h, int w, int c,
                   double fx, double fy, double cx, double cy,
                   const double* dist6, float* dst) {
  const double k1 = dist6[0], k2 = dist6[1], k3 = dist6[2], k4 = dist6[3];
  const double p1 = dist6[4], p2 = dist6[5];
  parallel_for(static_cast<int64_t>(h), [&](int64_t yi) {
    for (int xi = 0; xi < w; ++xi) {
      // undistorted pixel -> normalized camera coords
      const double xn = (xi - cx) / fx;
      const double yn = (yi - cy) / fy;
      const double r2 = xn * xn + yn * yn;
      const double radial =
          1.0 + r2 * (k1 + r2 * (k2 + r2 * (k3 + r2 * k4)));
      const double xd = xn * radial + 2.0 * p1 * xn * yn +
                        p2 * (r2 + 2.0 * xn * xn);
      const double yd = yn * radial + p1 * (r2 + 2.0 * yn * yn) +
                        2.0 * p2 * xn * yn;
      const float sx = static_cast<float>(xd * fx + cx);
      const float sy = static_cast<float>(yd * fy + cy);
      float* out = dst + (yi * w + xi) * c;
      for (int ch = 0; ch < c; ++ch)
        out[ch] = sample_bilinear(src, h, w, c, sx, sy, ch);
    }
  });
}

void resize_bilinear(const float* src, int h, int w, int c,
                     int oh, int ow, float* dst) {
  const float sy = static_cast<float>(h) / oh;
  const float sx = static_cast<float>(w) / ow;
  parallel_for(static_cast<int64_t>(oh), [&](int64_t yi) {
    for (int xi = 0; xi < ow; ++xi) {
      const float y = (yi + 0.5f) * sy - 0.5f;
      const float x = (xi + 0.5f) * sx - 0.5f;
      float* out = dst + (yi * ow + xi) * c;
      for (int ch = 0; ch < c; ++ch)
        out[ch] = sample_bilinear(src, h, w, c,
                                  std::max(0.0f, std::min(x, w - 1.0f)),
                                  std::max(0.0f, std::min(y, h - 1.0f)), ch);
    }
  });
}

// Mean distance to the k nearest neighbours of each point (grid-hash search;
// the simple_knn role in 3DGS seeding). pts is [n, 3] float32.
void knn_mean_dist(const float* pts, int64_t n, int k, float* out) {
  if (n == 0) return;
  float lo[3] = {pts[0], pts[1], pts[2]};
  float hi[3] = {pts[0], pts[1], pts[2]};
  for (int64_t i = 0; i < n; ++i)
    for (int d = 0; d < 3; ++d) {
      lo[d] = std::min(lo[d], pts[i * 3 + d]);
      hi[d] = std::max(hi[d], pts[i * 3 + d]);
    }
  const double vol =
      std::max(1e-12, static_cast<double>(hi[0] - lo[0]) * (hi[1] - lo[1]) *
                          (hi[2] - lo[2]));
  // cell sized so a 3x3x3 neighbourhood holds ~(3^3 · target) points
  const double cell =
      std::max(1e-6, std::cbrt(vol / static_cast<double>(n)) * 1.5);

  auto cell_of = [&](const float* p) -> int64_t {
    const int64_t cxi = static_cast<int64_t>((p[0] - lo[0]) / cell);
    const int64_t cyi = static_cast<int64_t>((p[1] - lo[1]) / cell);
    const int64_t czi = static_cast<int64_t>((p[2] - lo[2]) / cell);
    return (cxi * 73856093LL) ^ (cyi * 19349663LL) ^ (czi * 83492791LL);
  };
  (void)cell_of;

  auto key = [](int64_t x, int64_t y, int64_t z) -> int64_t {
    return (x * 73856093LL) ^ (y * 19349663LL) ^ (z * 83492791LL);
  };
  std::unordered_map<int64_t, std::vector<int64_t>> grid;
  grid.reserve(static_cast<size_t>(n));
  std::vector<int64_t> ci(n * 3);
  for (int64_t i = 0; i < n; ++i) {
    for (int d = 0; d < 3; ++d)
      ci[i * 3 + d] = static_cast<int64_t>((pts[i * 3 + d] - lo[d]) / cell);
    grid[key(ci[i * 3], ci[i * 3 + 1], ci[i * 3 + 2])].push_back(i);
  }

  parallel_for(n, [&](int64_t i) {
    const float* p = pts + i * 3;
    std::vector<float> best(k, 1e30f);
    for (int ring = 1; ring <= 4; ++ring) {  // grow search until k found
      for (int64_t dz = -ring; dz <= ring; ++dz)
        for (int64_t dy = -ring; dy <= ring; ++dy)
          for (int64_t dx = -ring; dx <= ring; ++dx) {
            if (ring > 1 && std::max({std::abs(dx), std::abs(dy),
                                      std::abs(dz)}) < ring)
              continue;  // only the new shell
            auto it = grid.find(key(ci[i * 3] + dx, ci[i * 3 + 1] + dy,
                                    ci[i * 3 + 2] + dz));
            if (it == grid.end()) continue;
            for (int64_t j : it->second) {
              if (j == i) continue;
              const float* q = pts + j * 3;
              const float d2 = (p[0] - q[0]) * (p[0] - q[0]) +
                               (p[1] - q[1]) * (p[1] - q[1]) +
                               (p[2] - q[2]) * (p[2] - q[2]);
              if (d2 < best[k - 1]) {
                int slot = k - 1;
                while (slot > 0 && best[slot - 1] > d2) {
                  best[slot] = best[slot - 1];
                  --slot;
                }
                best[slot] = d2;
              }
            }
          }
      if (best[k - 1] < 1e29f &&
          std::sqrt(best[k - 1]) < (ring - 0.0) * cell)
        break;  // kth neighbour provably inside the searched shells
    }
    float acc = 0.0f;
    int cnt = 0;
    for (int s = 0; s < k; ++s)
      if (best[s] < 1e29f) {
        acc += std::sqrt(best[s]);
        ++cnt;
      }
    out[i] = cnt ? acc / cnt : 0.0f;
  });
}

}  // extern "C"
