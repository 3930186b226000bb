// vittf_tpu native runtime library.
//
// Host-side helpers for the parts of the pipeline whose work is
// data-dependent and therefore hostile to XLA's static shapes:
//
//  - cc3d_label / cc3d_largest: 6-connected components over 3D masks via
//    two-pass union-find (the host/runtime counterpart of the device
//    label-propagation kernel in vittf_tpu/ops/connected.py; replaces the
//    reference's cc_torch CUDA extension for host pipelines)
//  - bilateral_grid_build: hash 6-D bilateral-space coordinates to unique
//    vertices and resolve the ±1 blur neighbor indices (the data-dependent
//    part of the reference's scipy.sparse grid construction,
//    bilateral_solver3d.py:57-81); the solver itself then runs on device
//    with static shapes.
//
// Build: g++ -O3 -march=native -shared -fPIC vittf_native.cpp -o libvittf_native.so
// Exposed via ctypes (vittf_tpu/native/__init__.py).

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Union-find connected components (6-connectivity)
// ---------------------------------------------------------------------------

static int32_t uf_find(std::vector<int32_t>& parent, int32_t x) {
  while (parent[x] != x) {
    parent[x] = parent[parent[x]];  // path halving
    x = parent[x];
  }
  return x;
}

static void uf_union(std::vector<int32_t>& parent, int32_t a, int32_t b) {
  a = uf_find(parent, a);
  b = uf_find(parent, b);
  if (a < b) parent[b] = a; else if (b < a) parent[a] = b;
}

// Labels the 6-connected components of `mask` (nonzero = foreground).
// `labels` receives compact ids 1..n (0 = background). Returns n.
int32_t cc3d_label(const uint8_t* mask, int32_t W, int32_t H, int32_t D,
                   int32_t* labels) {
  const int64_t n = (int64_t)W * H * D;
  std::vector<int32_t> parent(n);
  for (int64_t i = 0; i < n; ++i) parent[i] = (int32_t)i;

  auto idx = [H, D](int32_t w, int32_t h, int32_t d) -> int64_t {
    return ((int64_t)w * H + h) * D + d;
  };

  for (int32_t w = 0; w < W; ++w)
    for (int32_t h = 0; h < H; ++h)
      for (int32_t d = 0; d < D; ++d) {
        const int64_t i = idx(w, h, d);
        if (!mask[i]) continue;
        if (w > 0 && mask[idx(w - 1, h, d)]) uf_union(parent, (int32_t)i, (int32_t)idx(w - 1, h, d));
        if (h > 0 && mask[idx(w, h - 1, d)]) uf_union(parent, (int32_t)i, (int32_t)idx(w, h - 1, d));
        if (d > 0 && mask[idx(w, h, d - 1)]) uf_union(parent, (int32_t)i, (int32_t)idx(w, h, d - 1));
      }

  std::unordered_map<int32_t, int32_t> compact;
  int32_t next = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (!mask[i]) { labels[i] = 0; continue; }
    const int32_t root = uf_find(parent, (int32_t)i);
    auto it = compact.find(root);
    if (it == compact.end()) it = compact.emplace(root, ++next).first;
    labels[i] = it->second;
  }
  return next;
}

// Keeps only the largest component of `mask`, writing it to `out`.
// Returns the size of the kept component (0 if the mask is empty).
int64_t cc3d_largest(const uint8_t* mask, int32_t W, int32_t H, int32_t D,
                     uint8_t* out) {
  const int64_t n = (int64_t)W * H * D;
  std::vector<int32_t> labels(n);
  const int32_t ncomp = cc3d_label(mask, W, H, D, labels.data());
  if (ncomp == 0) { std::memset(out, 0, n); return 0; }
  std::vector<int64_t> sizes(ncomp + 1, 0);
  for (int64_t i = 0; i < n; ++i) sizes[labels[i]]++;
  sizes[0] = 0;
  int32_t best = 1;
  for (int32_t c = 2; c <= ncomp; ++c)
    if (sizes[c] > sizes[best]) best = c;
  for (int64_t i = 0; i < n; ++i) out[i] = labels[i] == best ? 1 : 0;
  return sizes[best];
}

// ---------------------------------------------------------------------------
// Sparse bilateral grid construction
// ---------------------------------------------------------------------------

// Packs a dim<=6 coordinate row (each value in [0, 1024)) into a 64-bit key
// by 10-bit fields (6·10 = 60 bits) with a mixing finalizer for the hash
// map. 1024 covers bilateral coordinates comfortably: spatial indices are
// extent/σ_spatial and luma/chroma are 255/σ.
struct KeyHash {
  size_t operator()(uint64_t k) const {
    k ^= k >> 33; k *= 0xff51afd7ed558ccdULL;
    k ^= k >> 33; k *= 0xc4ceb9fe1a85ec53ULL;
    k ^= k >> 33;
    return (size_t)k;
  }
};

static inline uint64_t pack_key(const int32_t* row, int32_t dim) {
  uint64_t key = 0;
  for (int32_t d = 0; d < dim; ++d)
    key = (key << 10) | (uint64_t)(row[d] & 0x3ff);
  return key;
}

// Hashes `coords` (npix x dim, values in [0, 8191]) to unique vertices.
// Outputs:
//   vertex_of_pixel (npix)              — vertex index per pixel
//   neighbors (max_vertices x dim x 2)  — vertex index of the -1/+1
//                                         neighbor along each dim, -1 if
//                                         that vertex is not occupied
// Returns the number of unique vertices (<= max_vertices), or -1 if
// max_vertices was too small.
int32_t bilateral_grid_build(const int32_t* coords, int64_t npix, int32_t dim,
                             int32_t* vertex_of_pixel, int32_t max_vertices,
                             int32_t* neighbors) {
  std::unordered_map<uint64_t, int32_t, KeyHash> table;
  table.reserve((size_t)(npix / 4 + 16));
  std::vector<int32_t> vert_coords;
  vert_coords.reserve((size_t)max_vertices * dim);
  int32_t nverts = 0;

  for (int64_t p = 0; p < npix; ++p) {
    const uint64_t key = pack_key(coords + p * dim, dim);
    auto it = table.find(key);
    if (it == table.end()) {
      if (nverts >= max_vertices) return -1;
      it = table.emplace(key, nverts).first;
      for (int32_t d = 0; d < dim; ++d)
        vert_coords.push_back(coords[p * dim + d]);
      ++nverts;
    }
    vertex_of_pixel[p] = it->second;
  }

  std::vector<int32_t> row(dim);
  for (int32_t v = 0; v < nverts; ++v) {
    for (int32_t d = 0; d < dim; ++d) row[d] = vert_coords[(size_t)v * dim + d];
    for (int32_t d = 0; d < dim; ++d) {
      for (int32_t off = 0; off < 2; ++off) {
        row[d] += off == 0 ? -1 : +1;
        int32_t nb = -1;
        if (row[d] >= 0) {
          auto it = table.find(pack_key(row.data(), dim));
          if (it != table.end()) nb = it->second;
        }
        neighbors[((int64_t)v * dim + d) * 2 + off] = nb;
        row[d] -= off == 0 ? -1 : +1;
      }
    }
  }
  return nverts;
}

}  // extern "C"
