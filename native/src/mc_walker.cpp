// Native marching-cubes table walker (host CPU).
//
// CPU counterpart of ops/marching_cubes.py (which replaces the reference's
// vtkContourFilter usage at Reconstruction/main.cxx:169-173). The lookup
// tables are NOT duplicated here: Python passes TRI_TABLE / corner / edge
// arrays from ops/mc_tables.py, keeping a single source of truth. Emits a
// triangle soup plus the same canonical global edge keys the JAX path uses,
// so vertex welding is identical across backends.

#include "common.h"

#include <cmath>
#include <cstring>

// Returns total triangle count (may exceed `cap`; only `cap` triangles are
// written). Output: verts_out[t*9..t*9+8] = 3 vertices x (x, y, z) in grid
// frame; keys_out[t*3..t*3+2] = canonical edge ids.
CDMI_API int64_t cdmi_marching_cubes_f64(
    const double* points, int nz, int ny, int nx, double iso,
    const double* xs, const double* ys, const double* zs,
    const int32_t* tri_table,      // 256 x 16
    const int32_t* edge_corners,   // 12 x 2
    const int32_t* corner_off,     // 8 x 3 (dx, dy, dz)
    const int32_t* edge_canon,     // 12 x 4 (axis, ox, oy, oz)
    double* verts_out, int64_t* keys_out, int64_t cap) {
  const int64_t plane = (int64_t)ny * nx;
  int64_t n_tris = 0;
  double corner_val[8];
  for (int k = 0; k < nz - 1; k++) {
    for (int j = 0; j < ny - 1; j++) {
      const double* base = points + (int64_t)k * plane + (int64_t)j * nx;
      for (int i = 0; i < nx - 1; i++) {
        int cfg = 0;
        for (int c = 0; c < 8; c++) {
          int dx = corner_off[c * 3 + 0];
          int dy = corner_off[c * 3 + 1];
          int dz = corner_off[c * 3 + 2];
          double val = base[(int64_t)dz * plane + (int64_t)dy * nx + i + dx];
          corner_val[c] = val;
          if (val < iso) cfg |= 1 << c;
        }
        if (cfg == 0 || cfg == 255) continue;
        const int32_t* row = tri_table + cfg * 16;
        for (int s = 0; s < 15 && row[s] >= 0; s += 3) {
          if (n_tris < cap) {
            for (int t = 0; t < 3; t++) {
              int e = row[s + t];
              int ca = edge_corners[e * 2 + 0];
              int cb = edge_corners[e * 2 + 1];
              double va = corner_val[ca];
              double vb = corner_val[cb];
              double denom = vb - va;
              double frac = denom != 0.0 ? (iso - va) / denom : 0.5;
              if (frac < 0.0) frac = 0.0;
              if (frac > 1.0) frac = 1.0;
              int ax = i + corner_off[ca * 3 + 0];
              int ay = j + corner_off[ca * 3 + 1];
              int az = k + corner_off[ca * 3 + 2];
              int bx = i + corner_off[cb * 3 + 0];
              int by = j + corner_off[cb * 3 + 1];
              int bz = k + corner_off[cb * 3 + 2];
              double* v = verts_out + (n_tris * 3 + t) * 3;
              v[0] = xs[ax] + frac * (xs[bx] - xs[ax]);
              v[1] = ys[ay] + frac * (ys[by] - ys[ay]);
              v[2] = zs[az] + frac * (zs[bz] - zs[az]);
              // Canonical global edge key (matches marching_cubes.py).
              int axis = edge_canon[e * 4 + 0];
              int64_t fx = i + edge_canon[e * 4 + 1];
              int64_t fy = j + edge_canon[e * 4 + 2];
              int64_t fz = k + edge_canon[e * 4 + 3];
              int64_t flat = (fz * ny + fy) * nx + fx;
              keys_out[n_tris * 3 + t] =
                  (int64_t)axis * ((int64_t)nx * ny * nz) + flat;
            }
          }
          n_tris++;
        }
      }
    }
  }
  return n_tris;
}
