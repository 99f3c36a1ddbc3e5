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
  std::vector<uint8_t> rank;
  UnionFind() {
    parent.reserve(1 << 16); parent.push_back(0);
    rank.reserve(1 << 16); rank.push_back(0);
  }
  int32_t make_set() {
    int32_t id = static_cast<int32_t>(parent.size());
    parent.push_back(id);
    rank.push_back(0);
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
    if (rank[a] < rank[b]) std::swap(a, b);
    parent[b] = a;
    if (rank[a] == rank[b]) ++rank[a];
  }
};

struct Run { int32_t z0, z1, lbl; };

// Shared run-based labeling core: decompose rows into foreground runs
// (foreground = lut[voxel] when lut != nullptr, else voxel != 0) and
// union overlapping runs of neighbor rows. Fills runs/row_start/uf.
void label_runs(const uint8_t* data, const uint8_t* lut,
                int64_t nx, int64_t ny, int64_t nz, int connectivity,
                std::vector<Run>& runs, std::vector<int64_t>& row_start,
                UnionFind& uf) {
  const int64_t n_rows = nx * ny;
  runs.reserve(1 << 16);
  row_start.assign(n_rows + 1, 0);
  for (int64_t r = 0; r < n_rows; ++r) {
    row_start[r] = static_cast<int64_t>(runs.size());
    const uint8_t* p = data + r * nz;
    int64_t z = 0;
    if (lut) {
      while (z < nz) {
        if (!lut[p[z]]) { ++z; continue; }
        const int64_t z0 = z;
        while (z < nz && lut[p[z]]) ++z;
        runs.push_back({(int32_t)z0, (int32_t)z, 0});
      }
    } else {
      while (z < nz) {
        if (!p[z]) { ++z; continue; }
        const int64_t z0 = z;
        while (z < nz && p[z]) ++z;
        runs.push_back({(int32_t)z0, (int32_t)z, 0});
      }
    }
  }
  row_start[n_rows] = static_cast<int64_t>(runs.size());

  struct ND { int dx, dy, sl; };
  ND nbrs[4];
  int n_nbr = 0;
  if (connectivity <= 1) {
    nbrs[n_nbr++] = {-1, 0, 0}; nbrs[n_nbr++] = {0, -1, 0};
  } else if (connectivity == 2) {
    nbrs[n_nbr++] = {-1, 0, 1}; nbrs[n_nbr++] = {0, -1, 1};
    nbrs[n_nbr++] = {-1, -1, 0}; nbrs[n_nbr++] = {-1, 1, 0};
  } else {
    nbrs[n_nbr++] = {-1, 0, 1}; nbrs[n_nbr++] = {0, -1, 1};
    nbrs[n_nbr++] = {-1, -1, 1}; nbrs[n_nbr++] = {-1, 1, 1};
  }

  for (int64_t x = 0; x < nx; ++x) {
    for (int64_t y = 0; y < ny; ++y) {
      const int64_t r = x * ny + y;
      int64_t cursor[4];
      int64_t cend[4];
      for (int k = 0; k < n_nbr; ++k) {
        const int64_t xx = x + nbrs[k].dx;
        const int64_t yy = y + nbrs[k].dy;
        if (xx < 0 || yy < 0 || yy >= ny) { cursor[k] = cend[k] = 0; continue; }
        const int64_t r2 = xx * ny + yy;
        cursor[k] = row_start[r2];
        cend[k] = row_start[r2 + 1];
      }
      for (int64_t ri = row_start[r]; ri < row_start[r + 1]; ++ri) {
        Run& run = runs[ri];
        int32_t lbl = 0;
        for (int k = 0; k < n_nbr; ++k) {
          const int sl = nbrs[k].sl;
          int64_t c = cursor[k];
          while (c < cend[k] && runs[c].z1 + sl <= run.z0) ++c;
          cursor[k] = c;
          for (; c < cend[k] && runs[c].z0 - sl < run.z1; ++c) {
            if (lbl) uf.unite(lbl, runs[c].lbl);
            else lbl = uf.find(runs[c].lbl);
          }
        }
        if (!lbl) lbl = uf.make_set();
        run.lbl = lbl;
      }
    }
  }
}

}  // namespace

extern "C" {

// Fused largest-unique-segment filter (BCA body_regions rules,
// `body_regions/postprocess.py:18-40`): components of {lut[seg]} are
// found run-based WITHOUT materializing a mask or a labels volume; every
// voxel outside the largest component is overwritten with ignore_value
// in place. Returns the number of components found.
int32_t boa_keep_largest_lut(uint8_t* seg, int64_t nx, int64_t ny, int64_t nz,
                             const uint8_t* lut, int connectivity,
                             uint8_t ignore_value) {
  std::vector<Run> runs;
  std::vector<int64_t> row_start;
  UnionFind uf;
  label_runs(seg, lut, nx, ny, nz, connectivity, runs, row_start, uf);
  if (runs.empty()) return 0;
  // component sizes from run lengths (no volume pass)
  std::vector<int64_t> sizes(uf.parent.size(), 0);
  for (Run& run : runs) {
    run.lbl = uf.find(run.lbl);
    sizes[run.lbl] += run.z1 - run.z0;
  }
  int32_t best = 0;
  int64_t best_size = -1;
  int32_t n_components = 0;
  for (size_t i = 1; i < sizes.size(); ++i) {
    if (sizes[i] > 0) {
      ++n_components;
      if (sizes[i] > best_size) { best_size = sizes[i]; best = (int32_t)i; }
    }
  }
  if (n_components <= 1) return n_components;
  const int64_t n_rows = nx * ny;
  for (int64_t r = 0; r < n_rows; ++r) {
    uint8_t* p = seg + r * nz;
    for (int64_t ri = row_start[r]; ri < row_start[r + 1]; ++ri) {
      const Run& run = runs[ri];
      if (run.lbl != best)
        for (int32_t z = run.z0; z < run.z1; ++z) p[z] = ignore_value;
    }
  }
  return n_components;
}

// mask: nx*ny*nz uint8 (C order, z fastest), connectivity: 1 (6-neigh),
// 2 (18-neigh) or 3 (26-neigh). labels_out: int32 buffer of same size.
// Returns number of components (labels are 1..n, background 0).
//
// Run-based two-pass labeling: rows (fixed x,y) are decomposed into
// foreground runs along the contiguous z axis; unions happen between
// overlapping runs of previously-visited neighbor rows with per-row
// forward-moving cursors (amortized linear). ~5-10x the per-voxel
// 13-neighbor scan this replaced (19 -> >100 Mvox/s on dense masks).
int32_t boa_label3d(const uint8_t* mask, int64_t nx, int64_t ny, int64_t nz,
                    int connectivity, int32_t* labels_out) {
  const int64_t n = nx * ny * nz;
  const int64_t n_rows = nx * ny;
  std::vector<Run> runs;
  std::vector<int64_t> row_start;
  UnionFind uf;
  label_runs(mask, nullptr, nx, ny, nz, connectivity, runs, row_start, uf);

  // compact relabel in first-seen scan order (matches scipy) + write out
  std::memset(labels_out, 0, sizeof(int32_t) * n);
  std::vector<int32_t> remap(uf.parent.size(), 0);
  int32_t next_label = 0;
  for (int64_t r = 0; r < n_rows; ++r) {
    int32_t* out_row = labels_out + r * nz;
    for (int64_t ri = row_start[r]; ri < row_start[r + 1]; ++ri) {
      const Run& run = runs[ri];
      const int32_t root = uf.find(run.lbl);
      if (!remap[root]) remap[root] = ++next_label;
      const int32_t lab = remap[root];
      for (int32_t z = run.z0; z < run.z1; ++z) out_row[z] = lab;
    }
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

namespace {

// Tiled 2D transpose-compare: for one x of the bbox, gather the (y, z)
// plane of `seg` (strides nz, 1) into the (z, y) plane of the zxy slab
// (strides bx*by, 1) as a label-equality bool. 64x64 tiles keep both
// sides cache-resident (a naive per-column copy misses on every write).
void gather_plane_eq(const uint8_t* src, int64_t src_ystride, int64_t by,
                     int64_t bz, uint8_t label, uint8_t* dst,
                     int64_t dst_zstride) {
  constexpr int64_t T = 64;
  for (int64_t yt = 0; yt < by; yt += T) {
    const int64_t ye = yt + T < by ? yt + T : by;
    for (int64_t zt = 0; zt < bz; zt += T) {
      const int64_t ze = zt + T < bz ? zt + T : bz;
      for (int64_t y = yt; y < ye; ++y) {
        const uint8_t* s = src + y * src_ystride;
        for (int64_t z = zt; z < ze; ++z)
          dst[z * dst_zstride + y] = (s[z] == label);
      }
    }
  }
}

// Per-slice external fill: scanline flood fill of the background from the
// slice border (4-connectivity), then everything NOT reached is
// foreground-or-enclosed. By 8/4-connectivity duality this equals filling
// the external contours of the 8-connected foreground (cv2 RETR_EXTERNAL
// + drawContours FILLED, `body_parts/postprocess.py:7-52`).
// slice: (sx, sy) contiguous, values {0,1}; marks outside cells as 2.
void flood_outside_2d(uint8_t* m, int64_t sx, int64_t sy,
                      std::vector<int64_t>& stack) {
  stack.clear();
  auto push_if_bg = [&](int64_t idx) {
    if (m[idx] == 0) { m[idx] = 2; stack.push_back(idx); }
  };
  for (int64_t y = 0; y < sy; ++y) {
    push_if_bg(y);
    push_if_bg((sx - 1) * sy + y);
  }
  for (int64_t x = 0; x < sx; ++x) {
    push_if_bg(x * sy);
    push_if_bg(x * sy + sy - 1);
  }
  while (!stack.empty()) {
    const int64_t idx = stack.back();
    stack.pop_back();
    const int64_t x = idx / sy, y = idx % sy;
    // extend the scanline along contiguous y first (cheap), then spill
    // across x (strided)
    int64_t lo = y, hi = y;
    while (lo > 0 && m[idx - (y - lo) - 1] == 0) {
      --lo; m[x * sy + lo] = 2;
    }
    while (hi + 1 < sy && m[x * sy + hi + 1] == 0) {
      ++hi; m[x * sy + hi] = 2;
    }
    for (int64_t yy = lo; yy <= hi; ++yy) {
      if (x > 0) push_if_bg((x - 1) * sy + yy);
      if (x + 1 < sx) push_if_bg((x + 1) * sy + yy);
    }
  }
}

}  // namespace

extern "C" {

// Fused per-label body-parts postprocess
// (`body_composition_analysis/body_parts/postprocess.py:7-52`): on the
// padded bbox [x0,x1)x[y0,y1)x[z0,z1) of `seg`, build {seg == label},
// fill each z slice's external contours, drop 26-conn components
// < threshold, re-open enclosed holes >= threshold (holes touching a
// pad-ring face are always re-opened; faces clamped to the volume edge
// follow the size rule), and write `label` into `out` at surviving
// voxels. ring6 = {x_lo, x_hi, y_lo, y_hi, z_lo, z_hi} pad-ring flags.
// Replaces ~6 full-bbox numpy/cv2 passes (transpose pair, cv2 slice
// loop, 2x int32 label volumes) with one slab + run-based CC.
// Returns the number of voxels written.
int64_t boa_parts_postprocess_label(
    const uint8_t* seg, int64_t nx, int64_t ny, int64_t nz, uint8_t label,
    int64_t x0, int64_t x1, int64_t y0, int64_t y1, int64_t z0, int64_t z1,
    const uint8_t* ring6, int64_t threshold, uint8_t* out) {
  const int64_t bx = x1 - x0, by = y1 - y0, bz = z1 - z0;
  if (bx <= 0 || by <= 0 || bz <= 0) return 0;
  // slab M in (z, x, y) layout: per-slice fill needs contiguous slices,
  // and label_runs' run axis becomes the contiguous y
  std::vector<uint8_t> M((size_t)(bz * bx * by));
  for (int64_t x = 0; x < bx; ++x)
    gather_plane_eq(seg + ((x0 + x) * ny + y0) * nz + z0, nz, by, bz, label,
                    M.data() + x * by, bx * by);

  std::vector<int64_t> stack;
  for (int64_t z = 0; z < bz; ++z) {
    uint8_t* slice = M.data() + z * bx * by;
    flood_outside_2d(slice, bx, by, stack);
    for (int64_t i = 0; i < bx * by; ++i) slice[i] = slice[i] != 2;
  }

  // 26-conn CC of the filled mask on the slab (dims (bz, bx, by): runs
  // along y); component sizes from run lengths, no labels volume
  std::vector<Run> runs;
  std::vector<int64_t> row_start;
  UnionFind uf;
  label_runs(M.data(), nullptr, bz, bx, by, 3, runs, row_start, uf);
  std::vector<int64_t> sizes(uf.parent.size(), 0);
  for (Run& run : runs) {
    run.lbl = uf.find(run.lbl);
    sizes[run.lbl] += run.z1 - run.z0;
  }
  // keep >= threshold (reference: skimage max_size=threshold-1 removes
  // size <= threshold-1); zero dropped runs out of M
  bool any = false;
  const int64_t n_rows = bz * bx;
  for (int64_t r = 0; r < n_rows; ++r) {
    uint8_t* row = M.data() + r * by;
    for (int64_t ri = row_start[r]; ri < row_start[r + 1]; ++ri) {
      Run& run = runs[ri];
      if (sizes[run.lbl] < threshold) {
        for (int32_t y = run.z0; y < run.z1; ++y) row[y] = 0;
        run.lbl = -1;
      } else {
        any = true;
      }
    }
  }
  if (!any) return 0;  // hole pass over pure background would be wasted

  // background CC (26-conn) via a 0->1 LUT over the filtered M
  uint8_t lut_inv[256] = {0};
  lut_inv[0] = 1;
  std::vector<Run> bruns;
  std::vector<int64_t> brow_start;
  UnionFind buf_;
  label_runs(M.data(), lut_inv, bz, bx, by, 3, bruns, brow_start, buf_);
  std::vector<int64_t> bsizes(buf_.parent.size(), 0);
  for (Run& run : bruns) {
    run.lbl = buf_.find(run.lbl);
    bsizes[run.lbl] += run.z1 - run.z0;
  }
  std::vector<uint8_t> keep(buf_.parent.size(), 0);
  for (size_t c = 0; c < keep.size(); ++c) keep[c] = bsizes[c] >= threshold;
  // pad-ring faces: that background is the outside — always re-opened.
  // ring6 is in original (x, y, z) axes; slab axes are (z, x, y):
  //   original x faces -> rows with slab x == 0 / bx-1
  //   original y faces -> run touching y == 0 / by-1 within a row
  //   original z faces -> rows with slab z == 0 / bz-1
  auto keep_rows = [&](int64_t r_begin, int64_t r_end, int64_t r_step) {
    for (int64_t r = r_begin; r < r_end; r += r_step)
      for (int64_t ri = brow_start[r]; ri < brow_start[r + 1]; ++ri)
        keep[bruns[ri].lbl] = 1;
  };
  if (ring6[4]) keep_rows(0, bx, 1);                      // z lo: z == 0
  if (ring6[5]) keep_rows((bz - 1) * bx, bz * bx, 1);     // z hi
  if (ring6[0]) keep_rows(0, n_rows, bx);                 // x lo: x == 0
  if (ring6[1]) keep_rows(bx - 1, n_rows, bx);            // x hi
  if (ring6[2] || ring6[3]) {
    for (int64_t r = 0; r < n_rows; ++r) {
      const int64_t rb = brow_start[r], re = brow_start[r + 1];
      if (rb == re) continue;
      if (ring6[2] && bruns[rb].z0 == 0) keep[bruns[rb].lbl] = 1;
      if (ring6[3] && bruns[re - 1].z1 == (int32_t)by) keep[bruns[re - 1].lbl] = 1;
    }
  }

  // final = filled foreground + non-kept (filled-in) background; write
  // `label` back into the original (x, y, z) layout
  int64_t written = 0;
  for (int64_t r = 0; r < n_rows; ++r) {
    const int64_t z = r / bx, x = r % bx;
    uint8_t* obase = out + ((x0 + x) * ny + y0) * nz + z0 + z;
    for (int64_t ri = row_start[r]; ri < row_start[r + 1]; ++ri) {
      const Run& run = runs[ri];
      if (run.lbl < 0) continue;
      for (int32_t y = run.z0; y < run.z1; ++y) obase[(int64_t)y * nz] = label;
      written += run.z1 - run.z0;
    }
    for (int64_t ri = brow_start[r]; ri < brow_start[r + 1]; ++ri) {
      const Run& run = bruns[ri];
      if (keep[run.lbl]) continue;
      for (int32_t y = run.z0; y < run.z1; ++y) obase[(int64_t)y * nz] = label;
      written += run.z1 - run.z0;
    }
  }
  return written;
}

}  // extern "C"

extern "C" {

// Fused single-pass min+max over a contiguous int16/float32 buffer.
// numpy's `arr.min(); arr.max()` walks the volume twice; on this host's
// ~150 MB/s memory a 300 MB CT costs ~4 s that way (compute/inference.py
// range_warning). One auto-vectorized pass halves the traffic and the
// ctypes call releases the GIL.
void boa_minmax_i16(const int16_t* p, int64_t n, int16_t* out_min,
                    int16_t* out_max) {
  int16_t mn0 = INT16_MAX, mn1 = INT16_MAX, mn2 = INT16_MAX, mn3 = INT16_MAX;
  int16_t mx0 = INT16_MIN, mx1 = INT16_MIN, mx2 = INT16_MIN, mx3 = INT16_MIN;
  int64_t i = 0;
  for (; i + 4 <= n; i += 4) {
    mn0 = p[i] < mn0 ? p[i] : mn0;         mx0 = p[i] > mx0 ? p[i] : mx0;
    mn1 = p[i + 1] < mn1 ? p[i + 1] : mn1; mx1 = p[i + 1] > mx1 ? p[i + 1] : mx1;
    mn2 = p[i + 2] < mn2 ? p[i + 2] : mn2; mx2 = p[i + 2] > mx2 ? p[i + 2] : mx2;
    mn3 = p[i + 3] < mn3 ? p[i + 3] : mn3; mx3 = p[i + 3] > mx3 ? p[i + 3] : mx3;
  }
  for (; i < n; ++i) {
    mn0 = p[i] < mn0 ? p[i] : mn0;
    mx0 = p[i] > mx0 ? p[i] : mx0;
  }
  mn0 = mn1 < mn0 ? mn1 : mn0; mn2 = mn3 < mn2 ? mn3 : mn2;
  mx0 = mx1 > mx0 ? mx1 : mx0; mx2 = mx3 > mx2 ? mx3 : mx2;
  *out_min = mn2 < mn0 ? mn2 : mn0;
  *out_max = mx2 > mx0 ? mx2 : mx0;
}

// float32 variant; NaNs are ignored (comparison-false), matching what the
// range check wants (a NaN voxel is caught by downstream clipping).
void boa_minmax_f32(const float* p, int64_t n, float* out_min,
                    float* out_max) {
  float mn0 = 3.4e38f, mn1 = 3.4e38f;
  float mx0 = -3.4e38f, mx1 = -3.4e38f;
  int64_t i = 0;
  for (; i + 2 <= n; i += 2) {
    mn0 = p[i] < mn0 ? p[i] : mn0;         mx0 = p[i] > mx0 ? p[i] : mx0;
    mn1 = p[i + 1] < mn1 ? p[i + 1] : mn1; mx1 = p[i + 1] > mx1 ? p[i + 1] : mx1;
  }
  for (; i < n; ++i) {
    mn0 = p[i] < mn0 ? p[i] : mn0;
    mx0 = p[i] > mx0 ? p[i] : mx0;
  }
  *out_min = mn1 < mn0 ? mn1 : mn0;
  *out_max = mx1 > mx0 ? mx1 : mx0;
}

// 256-bin histogram of a uint8 volume (label discovery without the
// int64 upcast np.bincount forces — that temp alone is 8x the volume).
void boa_histogram_u8(const uint8_t* data, int64_t n, int64_t* out256) {
  std::memset(out256, 0, 256 * sizeof(int64_t));
  int64_t local[4][256];
  std::memset(local, 0, sizeof(local));
  int64_t i = 0;
  for (; i + 4 <= n; i += 4) {  // split counters to break the dependency
    ++local[0][data[i]];
    ++local[1][data[i + 1]];
    ++local[2][data[i + 2]];
    ++local[3][data[i + 3]];
  }
  for (; i < n; ++i) ++local[0][data[i]];
  for (int k = 0; k < 4; ++k)
    for (int v = 0; v < 256; ++v) out256[v] += local[k][v];
}

// 4-bit label packing along axis 0 (ops/packing.py): out[k] =
// a[2k] << 4 | a[2k+1], planes of `plane` bytes. One sequential pass —
// the numpy form pays two shifted-temp volumes of extra traffic, which
// at this host's ~150 MB/s memcpy costs seconds per study.
void boa_pack4_axis0(const uint8_t* a, int64_t n_pairs, int64_t plane,
                     uint8_t* out) {
  for (int64_t k = 0; k < n_pairs; ++k) {
    const uint8_t* hi = a + 2 * k * plane;
    const uint8_t* lo = hi + plane;
    uint8_t* o = out + k * plane;
    for (int64_t i = 0; i < plane; ++i)
      o[i] = (uint8_t)(hi[i] << 4 | lo[i]);
  }
}

// Inverse of boa_pack4_axis0: out[2k] = p[k] >> 4, out[2k+1] = p[k] & 15.
void boa_unpack4_axis0(const uint8_t* p, int64_t n_pairs, int64_t plane,
                       uint8_t* out) {
  for (int64_t k = 0; k < n_pairs; ++k) {
    const uint8_t* s = p + k * plane;
    uint8_t* hi = out + 2 * k * plane;
    uint8_t* lo = hi + plane;
    for (int64_t i = 0; i < plane; ++i) {
      hi[i] = (uint8_t)(s[i] >> 4);
      lo[i] = (uint8_t)(s[i] & 0x0F);
    }
  }
}

// Tissue subclassification as one fused LUT pass (bca/tissues.py):
// out[i] = lut[regions[i] * 4096 + clamp(ct[i], -1024, 3071) + 1024].
// The LUT rows encode the (region, HU-range) -> tissue rules exactly as
// the device kernel applies them, so host and device tissue maps match
// bit-for-bit for int16 CTs — this replaces downloading the 4-bit-packed
// 157M-voxel tissue map through the tunnel (~5-7.5 s at 600 slices) with
// a ~1-2 s local pass over data the host already holds.
void boa_subclassify_lut(const int16_t* ct, const uint8_t* regions,
                         const uint8_t* lut /* 256 x 4096 */, int64_t n,
                         uint8_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    int hu = (int)ct[i];
    hu = hu < -1024 ? -1024 : (hu > 3071 ? 3071 : hu);
    out[i] = lut[((int64_t)regions[i] << 12) + (hu + 1024)];
  }
}

// Per-slice presence of labels in [vmin, vmax]: out[z * width + (v - vmin)]
// = 1 for every voxel value v in range (width = vmax - vmin + 1). One read
// pass over the (x, y, z) C-contiguous seg with a cache-resident output —
// the numpy equivalent (range mask + flatnonzero + bincount,
// bca/report.py create_vertebrae_info) walks ~3 volume-sized temps.
void boa_label_z_presence(const uint8_t* seg, int64_t nx, int64_t ny,
                          int64_t nz, int vmin, int vmax, uint8_t* out) {
  const int width = vmax - vmin + 1;
  std::memset(out, 0, (size_t)(nz * width));
  const int64_t nxy = nx * ny;
  const uint8_t lo = (uint8_t)vmin;
  const uint8_t span = (uint8_t)(vmax - vmin);
  for (int64_t r = 0; r < nxy; ++r) {
    const uint8_t* row = seg + r * nz;
    for (int64_t z = 0; z < nz; ++z) {
      const uint8_t d = (uint8_t)(row[z] - lo);
      if (d <= span) out[z * width + d] = 1;
    }
  }
}

}  // extern "C"
