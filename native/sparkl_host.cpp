// sparkl_tpu native host runtime.
//
// The TPU compute path is JAX/Pallas; this library is the C++ host layer for
// the work that stays on the CPU — the same split the reference makes between
// its PTX kernels and its Rust host crates (scene samplers in
// examples*/helper.rs, morton utilities in src_core/utils/morton*.rs, and the
// measure-then-allocate sparse-grid sizing in src/cuda/cuda_sparse_grid.rs).
//
// Exposed through ctypes (no pybind11 in this image); every function is
// plain-C ABI and operates on caller-allocated buffers.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libsparkl_host.so sparkl_host.cpp -pthread

#include <algorithm>
#include <atomic>
#include <functional>
#include <cstdint>
#include <cstring>
#include <cmath>
#include <random>
#include <thread>
#include <vector>

namespace {

inline uint64_t splitmix64(uint64_t& s) {
  uint64_t z = (s += 0x9E3779B97f4A7C15ull);
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
  return z ^ (z >> 31);
}

inline uint64_t part1by1(uint64_t x) {
  x &= 0xFFFFFFFFull;
  x = (x | (x << 16)) & 0x0000FFFF0000FFFFull;
  x = (x | (x << 8)) & 0x00FF00FF00FF00FFull;
  x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0Full;
  x = (x | (x << 2)) & 0x3333333333333333ull;
  x = (x | (x << 1)) & 0x5555555555555555ull;
  return x;
}

inline uint64_t part1by2(uint64_t x) {
  x &= 0x1FFFFFull;
  x = (x | (x << 32)) & 0x1F00000000FFFFull;
  x = (x | (x << 16)) & 0x1F0000FF0000FFull;
  x = (x | (x << 8)) & 0x100F00F00F00F00Full;
  x = (x | (x << 4)) & 0x10C30C30C30C30C3ull;
  x = (x | (x << 2)) & 0x1249249249249249ull;
  return x;
}

void parallel_for(int64_t n, const std::function<void(int64_t, int64_t)>& fn) {
  unsigned hw = std::max(1u, std::thread::hardware_concurrency());
  int64_t grain = (n + hw - 1) / hw;
  if (n < 65536 || hw == 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> ts;
  for (unsigned t = 0; t < hw; ++t) {
    int64_t lo = t * grain, hi = std::min<int64_t>(n, lo + grain);
    if (lo >= hi) break;
    ts.emplace_back([&, lo, hi] { fn(lo, hi); });
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

// Regular (optionally jittered) particle lattice with spacing 2r.
// out: float32 [nx*ny*nz (or nx*ny for dim 2), dim]. Returns particle count.
// Ref semantics: examples3d/helper.rs cube_particles.
int64_t sparkl_cube_particles(const double* origin, const int64_t* counts,
                              int dim, double radius, int randomize,
                              uint64_t seed, float* out) {
  int64_t n = 1;
  for (int i = 0; i < dim; ++i) n *= counts[i];
  double step = 2.0 * radius;
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    uint64_t rng = seed ^ (0xABCDull + (uint64_t)lo * 0x9E3779B97f4A7C15ull);
    for (int64_t idx = lo; idx < hi; ++idx) {
      int64_t rem = idx;
      int64_t coord[3] = {0, 0, 0};
      for (int ax = dim - 1; ax >= 0; --ax) {
        coord[ax] = rem % counts[ax];
        rem /= counts[ax];
      }
      for (int ax = 0; ax < dim; ++ax) {
        double x = origin[ax] + (double)coord[ax] * step;
        if (randomize) {
          double u = (double)(splitmix64(rng) >> 11) * 0x1.0p-53;
          x += (u * 2.0 - 1.0) * radius;
        }
        out[idx * dim + ax] = (float)x;
      }
    }
  });
  return n;
}

// Even-odd polygon containment for m points vs a k-vertex polygon (closed).
// Ref semantics: gpu_collider.rs polyline winding test / helper.rs
// sample_shape rejection sampling.
void sparkl_polygon_contains(const float* poly, int64_t k, const float* pts,
                             int64_t m, uint8_t* out) {
  parallel_for(m, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      float px = pts[i * 2], py = pts[i * 2 + 1];
      int inside = 0;
      for (int64_t e = 0; e < k; ++e) {
        float ax = poly[e * 2], ay = poly[e * 2 + 1];
        int64_t f = (e + 1) % k;
        float bx = poly[f * 2], by = poly[f * 2 + 1];
        if ((ay <= py) != (by <= py)) {
          float denom = by - ay;
          if (std::fabs(denom) < 1e-20f) denom = 1e-20f;
          float xint = ax + (py - ay) / denom * (bx - ax);
          if (xint > px) inside ^= 1;
        }
      }
      out[i] = (uint8_t)inside;
    }
  });
}

// Morton (Z-order) codes of particle positions in cell units.
// pos: float32 [n, dim]; out: uint64 [n]. Invalid (non-finite) -> UINT64_MAX.
// Ref semantics: src_core/utils/morton2.rs / morton3.rs.
void sparkl_morton_codes(const float* pos, int64_t n, int dim,
                         const float* origin, float inv_h, uint64_t* out) {
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      uint64_t code = 0;
      bool ok = true;
      int64_t c[3] = {0, 0, 0};
      for (int ax = 0; ax < dim; ++ax) {
        float v = (pos[i * dim + ax] - origin[ax]) * inv_h;
        if (!std::isfinite(v) || v < 0) ok = false;
        c[ax] = (int64_t)v;
      }
      if (!ok) {
        out[i] = ~0ull;
        continue;
      }
      if (dim == 2) {
        code = part1by1((uint64_t)c[0]) | (part1by1((uint64_t)c[1]) << 1);
      } else {
        code = part1by2((uint64_t)c[0]) | (part1by2((uint64_t)c[1]) << 1) |
               (part1by2((uint64_t)c[2]) << 2);
      }
      out[i] = code;
    }
  });
}

// Block-table sizing: given particle positions, count unique owner blocks,
// dispatch chunks of size C, and owner+corner grid-storage blocks.
// Ref semantics: the measure/regrow loop in cuda_sparse_grid.rs:161-253,
// done once on the host instead of per-substep on device.
// Returns 0 on success. Outputs: [n_blocks, n_chunks, n_grid_blocks].
int sparkl_calibrate_blocks(const float* pos, const uint8_t* active, int64_t n,
                            int dim, const double* origin, double cell_width,
                            const int64_t* res, int block_side, int chunk_size,
                            int64_t* out_counts) {
  std::vector<int64_t> keys;
  keys.reserve(n);
  int64_t bspace[3] = {1, 1, 1};
  for (int ax = 0; ax < dim; ++ax)
    bspace[ax] = (res[ax] + block_side - 1) / block_side;

  for (int64_t i = 0; i < n; ++i) {
    if (!active[i]) continue;
    int64_t bc[3];
    bool ok = true;
    for (int ax = 0; ax < dim; ++ax) {
      double g = ((double)pos[i * dim + ax] - origin[ax]) / cell_width;
      int64_t base = (int64_t)std::llround(g) - 1;
      if (base < 0 || base + 2 > res[ax] - 1) {
        ok = false;
        break;
      }
      bc[ax] = base / block_side;
    }
    if (!ok) continue;
    int64_t key = bc[0];
    for (int ax = 1; ax < dim; ++ax) key = key * bspace[ax] + bc[ax];
    keys.push_back(key);
  }
  std::sort(keys.begin(), keys.end());

  int64_t n_blocks = 0, n_chunks = 0;
  std::vector<int64_t> uniq;
  for (size_t i = 0; i < keys.size();) {
    size_t j = i;
    while (j < keys.size() && keys[j] == keys[i]) ++j;
    ++n_blocks;
    n_chunks += (int64_t)((j - i + chunk_size - 1) / chunk_size);
    uniq.push_back(keys[i]);
    i = j;
  }

  // Owner blocks + their 2^dim upper corners, deduplicated.
  std::vector<int64_t> grid_keys;
  grid_keys.reserve(uniq.size() << dim);
  int corners = 1 << dim;
  for (int64_t key : uniq) {
    int64_t bc[3], rem = key;
    for (int ax = dim - 1; ax >= 0; --ax) {
      bc[ax] = rem % bspace[ax];
      rem /= bspace[ax];
    }
    for (int cnr = 0; cnr < corners; ++cnr) {
      int64_t cc[3];
      bool ok = true;
      for (int ax = 0; ax < dim; ++ax) {
        cc[ax] = bc[ax] + ((cnr >> (dim - 1 - ax)) & 1);
        if (cc[ax] >= bspace[ax]) ok = false;
      }
      if (!ok) continue;
      int64_t gk = cc[0];
      for (int ax = 1; ax < dim; ++ax) gk = gk * bspace[ax] + cc[ax];
      grid_keys.push_back(gk);
    }
  }
  std::sort(grid_keys.begin(), grid_keys.end());
  grid_keys.erase(std::unique(grid_keys.begin(), grid_keys.end()),
                  grid_keys.end());

  out_counts[0] = n_blocks;
  out_counts[1] = n_chunks;
  out_counts[2] = (int64_t)grid_keys.size();
  return 0;
}

}  // extern "C"
