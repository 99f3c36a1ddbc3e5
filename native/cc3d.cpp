// 3D connected-component labeling + blob filtering primitives.
//
// TPU-native rebuild of the reference's CC substrate: the reference calls
// scipy.ndimage.label (C, 6-connectivity; totalsegmentator/postprocessing.py)
// and skimage.measure.label (C, 26-connectivity; body_composition_analysis/
// body_regions/postprocess.py). This is the host-side native path of
// boa_tpu.ops.connected_components (two-pass union-find, OpenMP-free,
// single allocation), exposed through ctypes.
//
// Build: make native  (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct UnionFind {
  std::vector<int32_t> parent;
  UnionFind() { parent.reserve(1 << 16); parent.push_back(0); }
  int32_t make_set() {
    int32_t id = static_cast<int32_t>(parent.size());
    parent.push_back(id);
    return id;
  }
  int32_t find(int32_t x) {
    int32_t root = x;
    while (parent[root] != root) root = parent[root];
    while (parent[x] != root) { int32_t next = parent[x]; parent[x] = root; x = next; }
    return root;
  }
  void unite(int32_t a, int32_t b) {
    a = find(a); b = find(b);
    if (a == b) return;
    if (a < b) parent[b] = a; else parent[a] = b;
  }
};

}  // namespace

extern "C" {

// mask: nx*ny*nz uint8 (C order, z fastest), connectivity: 1 (6-neigh) or
// 3 (26-neigh). labels_out: int32 buffer of same size. Returns number of
// components (labels are 1..n, background 0).
int32_t boa_label3d(const uint8_t* mask, int64_t nx, int64_t ny, int64_t nz,
                    int connectivity, int32_t* labels_out) {
  const int64_t sy = nz;        // stride of y
  const int64_t sx = ny * nz;   // stride of x
  const int64_t n = nx * ny * nz;
  std::memset(labels_out, 0, sizeof(int32_t) * n);

  // neighbor offsets with negative lexicographic order (already visited)
  int offs[13][3];
  int n_offs = 0;
  if (connectivity <= 1) {
    offs[n_offs][0] = -1; offs[n_offs][1] = 0;  offs[n_offs][2] = 0;  ++n_offs;
    offs[n_offs][0] = 0;  offs[n_offs][1] = -1; offs[n_offs][2] = 0;  ++n_offs;
    offs[n_offs][0] = 0;  offs[n_offs][1] = 0;  offs[n_offs][2] = -1; ++n_offs;
  } else {
    for (int dx = -1; dx <= 0; ++dx)
      for (int dy = -1; dy <= 1; ++dy)
        for (int dz = -1; dz <= 1; ++dz) {
          if (dx == 0 && (dy > 0 || (dy == 0 && dz >= 0))) continue;
          if (connectivity == 2 && (dx != 0) + (dy != 0) + (dz != 0) > 2) continue;
          offs[n_offs][0] = dx; offs[n_offs][1] = dy; offs[n_offs][2] = dz; ++n_offs;
        }
  }

  UnionFind uf;
  for (int64_t x = 0; x < nx; ++x) {
    for (int64_t y = 0; y < ny; ++y) {
      const int64_t base = x * sx + y * sy;
      for (int64_t z = 0; z < nz; ++z) {
        const int64_t i = base + z;
        if (!mask[i]) continue;
        int32_t lbl = 0;
        for (int k = 0; k < n_offs; ++k) {
          const int64_t xx = x + offs[k][0];
          const int64_t yy = y + offs[k][1];
          const int64_t zz = z + offs[k][2];
          if (xx < 0 || yy < 0 || zz < 0 || yy >= ny || zz >= nz) continue;
          const int64_t j = xx * sx + yy * sy + zz;
          const int32_t nl = labels_out[j];
          if (nl) {
            if (lbl) uf.unite(lbl, nl); else lbl = nl;
          }
        }
        if (!lbl) lbl = uf.make_set();
        labels_out[i] = lbl;
      }
    }
  }

  // compact relabel: root -> 1..n in first-seen order (matches scipy)
  std::vector<int32_t> remap(uf.parent.size(), 0);
  int32_t next_label = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int32_t l = labels_out[i];
    if (!l) continue;
    const int32_t root = uf.find(l);
    if (!remap[root]) remap[root] = ++next_label;
    labels_out[i] = remap[root];
  }
  return next_label;
}

// Component voxel counts: sizes_out must hold n_components+1 int64 entries.
void boa_component_sizes(const int32_t* labels, int64_t n, int32_t n_components,
                         int64_t* sizes_out) {
  std::memset(sizes_out, 0, sizeof(int64_t) * (n_components + 1));
  for (int64_t i = 0; i < n; ++i) ++sizes_out[labels[i]];
}

// Keep-largest-blob in one fused pass: mask -> mask of largest component.
int32_t boa_largest_component(const uint8_t* mask, int64_t nx, int64_t ny,
                              int64_t nz, int connectivity, uint8_t* out) {
  const int64_t n = nx * ny * nz;
  std::vector<int32_t> labels(n);
  const int32_t nc = boa_label3d(mask, nx, ny, nz, connectivity, labels.data());
  if (nc == 0) { std::memset(out, 0, n); return 0; }
  std::vector<int64_t> sizes(nc + 1, 0);
  boa_component_sizes(labels.data(), n, nc, sizes.data());
  int32_t best = 1;
  for (int32_t c = 2; c <= nc; ++c) if (sizes[c] > sizes[best]) best = c;
  for (int64_t i = 0; i < n; ++i) out[i] = labels[i] == best ? 1 : 0;
  return nc;
}

// Remove components whose voxel count lies outside [lo, hi].
int32_t boa_filter_components_by_size(const uint8_t* mask, int64_t nx, int64_t ny,
                                      int64_t nz, int connectivity, double lo,
                                      double hi, uint8_t* out) {
  const int64_t n = nx * ny * nz;
  std::vector<int32_t> labels(n);
  const int32_t nc = boa_label3d(mask, nx, ny, nz, connectivity, labels.data());
  std::vector<int64_t> sizes(nc + 1, 0);
  boa_component_sizes(labels.data(), n, nc, sizes.data());
  std::vector<uint8_t> keep(nc + 1, 0);
  for (int32_t c = 1; c <= nc; ++c) {
    const double s = static_cast<double>(sizes[c]);
    keep[c] = (s > lo && s <= hi) ? 1 : 0;  // reference: interval (lo, hi]
  }
  for (int64_t i = 0; i < n; ++i) out[i] = keep[labels[i]];
  return nc;
}

}  // extern "C"
