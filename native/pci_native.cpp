// Native host-side kernels for the pci_tpu input pipeline.
//
// The reference's dataloader leans on Open3D's C++ farthest-point
// downsampling (Dataset/InterpolationData.py:144-147) — the per-sample
// hot loop of its input pipeline.  This is the equivalent native kernel
// for this framework, exposed over a C ABI and loaded via ctypes
// (pci_tpu/data/native.py).
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Greedy farthest point sampling over an [n, stride] float32 array whose
// first 3 columns are xyz.  Writes `npoint` selected row indices.
// The inner relax+argmax pass is OpenMP-parallel (greedy iterations stay
// sequential by definition); ties break to the lowest index, matching the
// single-thread and device implementations exactly.
void pci_fps_indices(const float* pts, int64_t n, int64_t stride,
                     int64_t npoint, int64_t start, int32_t* out_idx) {
  if (n <= 0 || npoint <= 0) return;
  std::vector<float> dist(static_cast<size_t>(n),
                          std::numeric_limits<float>::infinity());
  int64_t farthest = start % n;
  for (int64_t i = 0; i < npoint; ++i) {
    out_idx[i] = static_cast<int32_t>(farthest);
    const float cx = pts[farthest * stride + 0];
    const float cy = pts[farthest * stride + 1];
    const float cz = pts[farthest * stride + 2];
    float best_d = -1.0f;
    int64_t best_j = n;
#ifdef _OPENMP
#pragma omp parallel
    {
      float loc_d = -1.0f;
      int64_t loc_j = n;
#pragma omp for nowait
      for (int64_t j = 0; j < n; ++j) {
        const float dx = pts[j * stride + 0] - cx;
        const float dy = pts[j * stride + 1] - cy;
        const float dz = pts[j * stride + 2] - cz;
        const float d = dx * dx + dy * dy + dz * dz;
        if (d < dist[j]) dist[j] = d;
        if (dist[j] > loc_d || (dist[j] == loc_d && j < loc_j)) {
          loc_d = dist[j];
          loc_j = j;
        }
      }
#pragma omp critical
      {
        if (loc_d > best_d || (loc_d == best_d && loc_j < best_j)) {
          best_d = loc_d;
          best_j = loc_j;
        }
      }
    }
#else
    for (int64_t j = 0; j < n; ++j) {
      const float dx = pts[j * stride + 0] - cx;
      const float dy = pts[j * stride + 1] - cy;
      const float dz = pts[j * stride + 2] - cz;
      const float d = dx * dx + dy * dy + dz * dz;
      if (d < dist[j]) dist[j] = d;
      if (dist[j] > best_d || (dist[j] == best_d && j < best_j)) {
        best_d = dist[j];
        best_j = j;
      }
    }
#endif
    farthest = best_j;
  }
}

// Uniform voxel-grid downsample: keeps the first point seen per voxel.
// Returns the number of kept indices (<= max_out).
int64_t pci_voxel_downsample(const float* pts, int64_t n, int64_t stride,
                             float voxel, int32_t* out_idx, int64_t max_out) {
  if (n <= 0 || voxel <= 0.0f) return 0;
  // open-addressing hash set of voxel keys
  size_t cap = 1;
  while (cap < static_cast<size_t>(n) * 2) cap <<= 1;
  std::vector<uint64_t> keys(cap, UINT64_MAX);
  int64_t kept = 0;
  const float inv = 1.0f / voxel;
  for (int64_t j = 0; j < n && kept < max_out; ++j) {
    const int64_t vx = static_cast<int64_t>(pts[j * stride + 0] * inv + 1e6f);
    const int64_t vy = static_cast<int64_t>(pts[j * stride + 1] * inv + 1e6f);
    const int64_t vz = static_cast<int64_t>(pts[j * stride + 2] * inv + 1e6f);
    uint64_t key = (static_cast<uint64_t>(vx) * 73856093ull) ^
                   (static_cast<uint64_t>(vy) * 19349663ull) ^
                   (static_cast<uint64_t>(vz) * 83492791ull);
    if (key == UINT64_MAX) key = 0;
    size_t slot = key & (cap - 1);
    bool found = false;
    while (keys[slot] != UINT64_MAX) {
      if (keys[slot] == key) {
        found = true;
        break;
      }
      slot = (slot + 1) & (cap - 1);
    }
    if (!found) {
      keys[slot] = key;
      out_idx[kept++] = static_cast<int32_t>(j);
    }
  }
  return kept;
}

}  // extern "C"
