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
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
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

// Load a float32 [.bin] scan of `width` columns and random-subsample to
// `npoints` rows without replacement (wrap-pad when the scan is short),
// writing [npoints, width] floats into `out`.  One mmap read (no python
// -> numpy -> index round trip), partial Fisher-Yates with a
// splitmix64-seeded xorshift generator (deterministic per seed), and an
// OpenMP-parallel row copy.  Returns the scan's row count, or -1 on IO
// failure (caller falls back to the numpy path).
int64_t pci_load_scan(const char* path, int64_t width, int64_t npoints,
                      uint64_t seed, float* out) {
  if (width <= 0 || npoints <= 0) return -1;
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return -1;
  }
  const int64_t n = st.st_size / (4 * width);
  if (n <= 0) {
    close(fd);
    return -1;
  }
  const float* pts = static_cast<const float*>(
      mmap(nullptr, static_cast<size_t>(st.st_size), PROT_READ, MAP_PRIVATE,
           fd, 0));
  if (pts == MAP_FAILED) {
    close(fd);
    return -1;
  }

  // splitmix64 -> xorshift128+ state
  uint64_t s = seed + 0x9E3779B97F4A7C15ull;
  auto mix = [&s]() {
    s += 0x9E3779B97F4A7C15ull;
    uint64_t z = s;
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
    return z ^ (z >> 31);
  };
  uint64_t s0 = mix(), s1 = mix();
  auto next_u64 = [&s0, &s1]() {
    uint64_t x = s0;
    const uint64_t y = s1;
    s0 = y;
    x ^= x << 23;
    s1 = x ^ y ^ (x >> 17) ^ (y >> 26);
    return s1 + y;
  };

  std::vector<int32_t> idx;
  if (n >= npoints) {
    // partial Fisher-Yates: first `npoints` entries of a shuffle of [0,n)
    idx.resize(static_cast<size_t>(n));
    for (int64_t j = 0; j < n; ++j) idx[j] = static_cast<int32_t>(j);
    for (int64_t j = 0; j < npoints; ++j) {
      const int64_t r = j + static_cast<int64_t>(next_u64() % (n - j));
      std::swap(idx[j], idx[r]);
    }
  } else {
    // all rows then wrap-pad with random picks (reference protocol)
    idx.resize(static_cast<size_t>(npoints));
    for (int64_t j = 0; j < n; ++j) idx[j] = static_cast<int32_t>(j);
    for (int64_t j = n; j < npoints; ++j)
      idx[j] = static_cast<int32_t>(next_u64() % n);
  }

#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t j = 0; j < npoints; ++j) {
    std::memcpy(out + j * width, pts + static_cast<int64_t>(idx[j]) * width,
                static_cast<size_t>(width) * sizeof(float));
  }

  munmap(const_cast<float*>(pts), static_cast<size_t>(st.st_size));
  close(fd);
  return n;
}

}  // extern "C"

