// Native float64 TSDF integrator (host CPU).
//
// Semantics-exact counterpart of the CUDA kernel
// (Reconstruction/CudaReconstruction.cu:158-212): per cell center, project
// through gridMatrix -> RT -> K, perspective-divide with round-half-away,
// bounds test, -1 sentinel test, piecewise ray potential, accumulate.
// Used as (a) a fast native oracle cross-checking the NumPy one and (b) the
// CPU fallback integrator for hosts without accelerators. OpenMP-free;
// threads via a simple slab split to stay dependency-lean.

#include "common.h"

#include <cmath>
#include <thread>
#include <vector>

namespace {

struct ViewArgs {
  const double* p;      // 4x4 row-major composed K4 @ RT @ gridMatrix
  const double* cam_z;  // length-4 affine row: camera-z of a grid point
  const double* depth;  // h*w, row-major top-down
  int h, w;
};

struct GridArgs {
  int cx, cy, cz;
  double ox, oy, oz;
  double sx, sy, sz;
};

struct RayArgs {
  double thick, rho, eta, delta;
};

inline double round_half_away(double x) {
  return x < 0.0 ? -std::floor(-x + 0.5) : std::floor(x + 0.5);
}

inline double ray_potential(double diff, const RayArgs& r) {
  double a = std::fabs(diff);
  if (a > r.delta) return diff > 0 ? 0.0 : -r.eta * r.rho;
  if (a > r.thick) return diff > 0 ? r.rho : -r.rho;
  return (r.rho / r.thick) * diff;
}

void integrate_slab(const GridArgs& g, const RayArgs& r, const ViewArgs* views,
                    int n_views, int k0, int k1, double* out) {
  for (int k = k0; k < k1; k++) {
    double zc = g.oz + (k + 0.5) * g.sz;
    for (int j = 0; j < g.cy; j++) {
      double yc = g.oy + (j + 0.5) * g.sy;
      double* row = out + ((int64_t)k * g.cy + j) * g.cx;
      for (int i = 0; i < g.cx; i++) {
        double xc = g.ox + (i + 0.5) * g.sx;
        double acc = 0.0;
        for (int v = 0; v < n_views; v++) {
          const ViewArgs& vw = views[v];
          const double* p = vw.p;
          double h0 = p[0] * xc + p[1] * yc + p[2] * zc + p[3];
          double h1 = p[4] * xc + p[5] * yc + p[6] * zc + p[7];
          double h2 = p[8] * xc + p[9] * yc + p[10] * zc + p[11];
          if (h2 < 0) continue;  // CudaReconstruction.cu:177-180
          double u = round_half_away(h0 / h2);
          double vpix = round_half_away(h1 / h2);
          if (!(u >= 0) || !(vpix >= 0) || u >= vw.w || vpix >= vw.h) continue;
          double d = vw.depth[(int64_t)vpix * vw.w + (int64_t)u];
          if (d == -1.0) continue;
          const double* c = vw.cam_z;
          double zcam = c[0] * xc + c[1] * yc + c[2] * zc + c[3];
          acc += ray_potential(zcam - d, r);
        }
        row[i] += acc;
      }
    }
  }
}

}  // namespace

// Integrate n_views into out (cz, cy, cx) float64, row-major (z, y, x).
// proj: n_views * 12 doubles (rows 0..2 of the composed 4x4);
// cam_rows: n_views * 4 doubles; depths: concatenated h*w per view.
CDMI_API void cdmi_integrate_f64(
    const double* proj, const double* cam_rows, const double* depths,
    int n_views, int h, int w,
    int cx, int cy, int cz,
    double ox, double oy, double oz,
    double sx, double sy, double sz,
    double thick, double rho, double eta, double delta,
    double* out, int n_threads) {
  GridArgs g{cx, cy, cz, ox, oy, oz, sx, sy, sz};
  RayArgs r{thick, rho, eta, delta};
  std::vector<ViewArgs> views(n_views);
  for (int v = 0; v < n_views; v++) {
    views[v] = ViewArgs{proj + 12 * v, cam_rows + 4 * v,
                        depths + (int64_t)v * h * w, h, w};
  }
  if (n_threads <= 1 || cz < 2) {
    integrate_slab(g, r, views.data(), n_views, 0, cz, out);
    return;
  }
  int nt = n_threads < cz ? n_threads : cz;
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; t++) {
    int k0 = (int)((int64_t)cz * t / nt);
    int k1 = (int)((int64_t)cz * (t + 1) / nt);
    threads.emplace_back(integrate_slab, std::cref(g), std::cref(r),
                         views.data(), n_views, k0, k1, out);
  }
  for (auto& th : threads) th.join();
}
