// Native host-side runtime kernels (C++17, OpenMP), loaded via ctypes.
//
// TPU-native replacement for the reference's mycpp pybind11 extension
// (mycpp/src/app/pybind_api.cpp): pose clustering for the rotation grid,
// plus a grid-hash DBSCAN used by the point-cloud preprocessing layer
// (the reference used Open3D's C++ cluster_dbscan).  Python fallbacks live in
// sixdof_tpu/ops/{hypotheses,pointcloud}.py; this library accelerates the
// host path for large inputs.
//
// Build: see native/build.sh (g++ -O3 -fopenmp -shared -fPIC).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// Greedy pose clustering (mycpp/src/app/pybind_api.cpp:24-68 semantics).
// poses: n x 16 row-major 4x4; sym: s x 16; keep: n output flags.
// Keep pose i iff for every kept j: ||t_i - t_j|| >= dist_diff OR all
// symmetry-composed rotations differ by >= angle_diff_deg geodesically.
void cluster_poses(const float* poses, int64_t n, const float* sym, int64_t s,
                   float angle_diff_deg, float dist_diff, uint8_t* keep) {
  const float radian_thres = angle_diff_deg / 180.0f * (float)M_PI;
  if (n <= 0) return;  // empty batch: keep[] has no slot 0 to write
  std::vector<int64_t> kept;
  kept.reserve(n);
  keep[0] = 1;
  kept.push_back(0);

  // precompute symmetry-composed rotations per candidate lazily
  std::vector<float> cur_rots(s * 9);
  for (int64_t i = 1; i < n; i++) {
    const float* P = poses + i * 16;
    // cur_rots[k] = (P @ sym_k)[:3,:3]
    for (int64_t k = 0; k < s; k++) {
      const float* S = sym + k * 16;
      float* R = cur_rots.data() + k * 9;
      for (int r = 0; r < 3; r++)
        for (int c = 0; c < 3; c++) {
          float acc = 0.f;
          for (int m = 0; m < 3; m++) acc += P[r * 4 + m] * S[m * 4 + c];
          R[r * 3 + c] = acc;
        }
    }
    bool isnew = true;
    for (int64_t jj = 0; jj < (int64_t)kept.size() && isnew; jj++) {
      const float* Q = poses + kept[jj] * 16;
      float dt = 0.f;
      for (int r = 0; r < 3; r++) {
        float d = P[r * 4 + 3] - Q[r * 4 + 3];
        dt += d * d;
      }
      if (std::sqrt(dt) >= dist_diff) continue;
      for (int64_t k = 0; k < s; k++) {
        const float* R = cur_rots.data() + k * 9;
        // trace(R @ Q_rot^T)
        float tr = 0.f;
        for (int r = 0; r < 3; r++)
          for (int c = 0; c < 3; c++) tr += R[r * 3 + c] * Q[r * 4 + c];
        float cosv = (tr - 1.f) / 2.f;
        cosv = cosv > 1.f ? 1.f : (cosv < -1.f ? -1.f : cosv);
        if (std::acos(cosv) < radian_thres) {
          isnew = false;
          break;
        }
      }
    }
    keep[i] = isnew ? 1 : 0;
    if (isnew) kept.push_back(i);
  }
}

struct CellKey {
  int64_t x, y, z;
  bool operator==(const CellKey& o) const { return x == o.x && y == o.y && z == o.z; }
};
struct CellHash {
  size_t operator()(const CellKey& k) const {
    return (size_t)(k.x * 73856093LL ^ k.y * 19349663LL ^ k.z * 83492791LL);
  }
};

// Exact DBSCAN via grid hashing (cell = eps): labels[i] = cluster id or -1.
// Returns the number of clusters.
int64_t dbscan(const double* pts, int64_t n, double eps, int64_t min_pts,
               int64_t* labels) {
  const double eps2 = eps * eps;
  std::unordered_map<CellKey, std::vector<int32_t>, CellHash> grid;
  grid.reserve(n);
  auto cell_of = [&](int64_t i) {
    return CellKey{(int64_t)std::floor(pts[i * 3] / eps),
                   (int64_t)std::floor(pts[i * 3 + 1] / eps),
                   (int64_t)std::floor(pts[i * 3 + 2] / eps)};
  };
  for (int64_t i = 0; i < n; i++) grid[cell_of(i)].push_back((int32_t)i);

  auto for_neighbors = [&](int64_t i, auto&& fn) {
    CellKey c = cell_of(i);
    for (int64_t dx = -1; dx <= 1; dx++)
      for (int64_t dy = -1; dy <= 1; dy++)
        for (int64_t dz = -1; dz <= 1; dz++) {
          auto it = grid.find(CellKey{c.x + dx, c.y + dy, c.z + dz});
          if (it == grid.end()) continue;
          for (int32_t j : it->second) {
            double d0 = pts[i * 3] - pts[j * 3];
            double d1 = pts[i * 3 + 1] - pts[j * 3 + 1];
            double d2 = pts[i * 3 + 2] - pts[j * 3 + 2];
            if (d0 * d0 + d1 * d1 + d2 * d2 <= eps2) fn(j);
          }
        }
  };

  std::vector<int32_t> ncount(n, 0);
#pragma omp parallel for schedule(dynamic, 256)
  for (int64_t i = 0; i < n; i++) {
    int32_t cnt = 0;
    for_neighbors(i, [&](int32_t) { cnt++; });
    ncount[i] = cnt;  // includes self, like Open3D radius count
  }

  std::memset(labels, -1, sizeof(int64_t) * n);
  int64_t next_label = 0;
  std::vector<int32_t> stack;
  for (int64_t i = 0; i < n; i++) {
    if (labels[i] != -1 || ncount[i] < min_pts) continue;
    // BFS from core point i
    int64_t lab = next_label++;
    labels[i] = lab;
    stack.clear();
    stack.push_back((int32_t)i);
    while (!stack.empty()) {
      int32_t p = stack.back();
      stack.pop_back();
      if (ncount[p] < min_pts) continue;  // border: claimed but not expanded
      for_neighbors(p, [&](int32_t q) {
        if (labels[q] == -1) {
          labels[q] = lab;
          stack.push_back(q);
        }
      });
    }
  }
  return next_label;
}

// Radius-count against a reference cloud: out[i] = 1 if pts[i] has ANY
// reference point within radius (used by background removal).
void has_neighbor_within(const double* pts, int64_t n, const double* ref,
                         int64_t m, double radius, uint8_t* out) {
  const double r2 = radius * radius;
  std::unordered_map<CellKey, std::vector<int32_t>, CellHash> grid;
  grid.reserve(m);
  for (int64_t i = 0; i < m; i++)
    grid[CellKey{(int64_t)std::floor(ref[i * 3] / radius),
                 (int64_t)std::floor(ref[i * 3 + 1] / radius),
                 (int64_t)std::floor(ref[i * 3 + 2] / radius)}]
        .push_back((int32_t)i);

#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; i++) {
    CellKey c{(int64_t)std::floor(pts[i * 3] / radius),
              (int64_t)std::floor(pts[i * 3 + 1] / radius),
              (int64_t)std::floor(pts[i * 3 + 2] / radius)};
    uint8_t found = 0;
    for (int64_t dx = -1; dx <= 1 && !found; dx++)
      for (int64_t dy = -1; dy <= 1 && !found; dy++)
        for (int64_t dz = -1; dz <= 1 && !found; dz++) {
          auto it = grid.find(CellKey{c.x + dx, c.y + dy, c.z + dz});
          if (it == grid.end()) continue;
          for (int32_t j : it->second) {
            double d0 = pts[i * 3] - ref[j * 3];
            double d1 = pts[i * 3 + 1] - ref[j * 3 + 1];
            double d2 = pts[i * 3 + 2] - ref[j * 3 + 2];
            if (d0 * d0 + d1 * d1 + d2 * d2 <= r2) {
              found = 1;
              break;
            }
          }
        }
    out[i] = found;
  }
}

}  // extern "C"
