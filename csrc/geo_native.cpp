// Native geo kernels for the host-side pipeline.
//
// The reference's performance-critical host code lives in external native
// dependencies: rpcm's per-pixel iterative RPC localization (pure python,
// minutes per scene — reference datasets/satellite.py:65-121 cold path) and
// numba-JIT'd NCC registration loops (dsmr.py). This translation unit
// provides the equivalents as a small C++/OpenMP library with a C ABI,
// loaded via ctypes (no pybind11 in the image). The Python implementations
// remain as reference/fallback; tests assert bit-level agreement.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC geo_native.cpp -o libeonerf_native.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>

extern "C" {

// ---------------------------------------------------------------------------
// 20-term cubic RPC polynomial (term order per sat_utils.py:437-450;
// x = lat_n, y = lon_n, z = alt_n)
// ---------------------------------------------------------------------------

static inline double poly20(const double* p, double x, double y, double z) {
  return p[0] + p[1] * y + p[2] * x + p[3] * z + p[4] * y * x + p[5] * y * z +
         p[6] * x * z + p[7] * y * y + p[8] * x * x + p[9] * z * z +
         p[10] * x * y * z + p[11] * y * y * y + p[12] * y * x * x +
         p[13] * y * z * z + p[14] * y * y * x + p[15] * x * x * x +
         p[16] * x * z * z + p[17] * y * y * z + p[18] * x * x * z +
         p[19] * z * z * z;
}

static inline void poly20_grad(const double* p, double x, double y, double z,
                               double* dx, double* dy) {
  *dx = p[2] + p[4] * y + p[6] * z + 2 * p[8] * x + p[10] * y * z +
        2 * p[12] * y * x + p[14] * y * y + 3 * p[15] * x * x + p[16] * z * z +
        2 * p[18] * x * z;
  *dy = p[1] + p[4] * x + p[5] * z + 2 * p[7] * y + p[10] * x * z +
        3 * p[11] * y * y + p[12] * x * x + p[13] * z * z + 2 * p[14] * y * x +
        2 * p[17] * y * z;
}

struct RpcCoeffs {
  double row_offset, col_offset, lat_offset, lon_offset, alt_offset;
  double row_scale, col_scale, lat_scale, lon_scale, alt_scale;
  double row_num[20], row_den[20], col_num[20], col_den[20];
};

// Batch Newton inverse localization: (col, row, alt) -> (lon, lat).
// Mirrors eonerf_code_tpu/geo/rpc.py::localize (fixed iteration count).
void rpc_localize_batch(const RpcCoeffs* c, const double* cols,
                        const double* rows, const double* alts, int64_t n,
                        int iters, double* lons, double* lats) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const double ncol = (cols[i] - c->col_offset) / c->col_scale;
    const double nrow = (rows[i] - c->row_offset) / c->row_scale;
    const double nalt = (alts[i] - c->alt_offset) / c->alt_scale;
    double x = 0.0, y = 0.0;  // lat_n, lon_n
    for (int it = 0; it < iters; ++it) {
      const double cn = poly20(c->col_num, x, y, nalt);
      const double cd = poly20(c->col_den, x, y, nalt);
      const double rn = poly20(c->row_num, x, y, nalt);
      const double rd = poly20(c->row_den, x, y, nalt);
      const double fc = cn / cd - ncol;
      const double fr = rn / rd - nrow;
      double cnx, cny, cdx, cdy, rnx, rny, rdx, rdy;
      poly20_grad(c->col_num, x, y, nalt, &cnx, &cny);
      poly20_grad(c->col_den, x, y, nalt, &cdx, &cdy);
      poly20_grad(c->row_num, x, y, nalt, &rnx, &rny);
      poly20_grad(c->row_den, x, y, nalt, &rdx, &rdy);
      const double inv_cd2 = 1.0 / (cd * cd);
      const double inv_rd2 = 1.0 / (rd * rd);
      const double jcx = (cnx * cd - cn * cdx) * inv_cd2;
      const double jcy = (cny * cd - cn * cdy) * inv_cd2;
      const double jrx = (rnx * rd - rn * rdx) * inv_rd2;
      const double jry = (rny * rd - rn * rdy) * inv_rd2;
      const double inv_det = 1.0 / (jcx * jry - jcy * jrx);
      x -= inv_det * (jry * fc - jcy * fr);
      y -= inv_det * (-jrx * fc + jcx * fr);
    }
    lats[i] = x * c->lat_scale + c->lat_offset;
    lons[i] = y * c->lon_scale + c->lon_offset;
  }
}

// Batch forward projection: (lon, lat, alt) -> (col, row).
void rpc_project_batch(const RpcCoeffs* c, const double* lons,
                       const double* lats, const double* alts, int64_t n,
                       double* cols, double* rows) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const double y = (lons[i] - c->lon_offset) / c->lon_scale;
    const double x = (lats[i] - c->lat_offset) / c->lat_scale;
    const double z = (alts[i] - c->alt_offset) / c->alt_scale;
    const double col =
        poly20(c->col_num, x, y, z) / poly20(c->col_den, x, y, z);
    const double row =
        poly20(c->row_num, x, y, z) / poly20(c->row_den, x, y, z);
    cols[i] = col * c->col_scale + c->col_offset;
    rows[i] = row * c->row_scale + c->row_offset;
  }
}

// ---------------------------------------------------------------------------
// NaN-aware NCC shift search (dsmr.py:50-117 semantics): for each candidate
// (dx, dy) in [initdx-irange, initdx+irange] x [initdy-...], compute masked
// NCC of u[j, i] vs v[j+dy, i+dx]; return the first maximum scanning y-major
// (the reference tie-break order).
// ---------------------------------------------------------------------------

void ncc_search(const double* u, const double* v, int64_t h, int64_t w,
                int irange, int initdx, int initdy, int* best_dx,
                int* best_dy) {
  const int span = 2 * irange + 1;
  double best = -std::numeric_limits<double>::infinity();
  int bx = initdx, by = initdy;
  // parallelize over candidate shifts; reduce with the y-major-first rule
  double* scores = new double[span * span];
#pragma omp parallel for collapse(2) schedule(static)
  for (int yy = 0; yy < span; ++yy) {
    for (int xx = 0; xx < span; ++xx) {
      const int dy = initdy - irange + yy;
      const int dx = initdx - irange + xx;
      double su = 0, sv = 0, suu = 0, svv = 0, suv = 0;
      int64_t count = 0;
      const int64_t j0 = dy < 0 ? -dy : 0, j1 = (h - dy < h ? h - dy : h);
      const int64_t i0 = dx < 0 ? -dx : 0, i1 = (w - dx < w ? w - dx : w);
      for (int64_t j = j0; j < (j1 > 0 ? j1 : 0); ++j) {
        const double* urow = u + j * w;
        const double* vrow = v + (j + dy) * w + dx;
        for (int64_t i = i0; i < (i1 > 0 ? i1 : 0); ++i) {
          const double a = urow[i];
          const double b = vrow[i];
          if (std::isfinite(a) && std::isfinite(b)) {
            su += a; sv += b; suu += a * a; svv += b * b; suv += a * b;
            ++count;
          }
        }
      }
      double score = -std::numeric_limits<double>::infinity();
      if (count > 0) {
        const double mu = su / count, mv = sv / count;
        const double sigu = std::sqrt(suu / count - mu * mu);
        const double sigv = std::sqrt(svv / count - mv * mv);
        const double xc = suv / count - mu * mv;
        if (sigu > 0 && sigv > 0) score = xc / (sigu * sigv);
      }
      scores[yy * span + xx] = score;
    }
  }
  for (int yy = 0; yy < span; ++yy)
    for (int xx = 0; xx < span; ++xx)
      if (scores[yy * span + xx] > best) {
        best = scores[yy * span + xx];
        by = initdy - irange + yy;
        bx = initdx - irange + xx;
      }
  delete[] scores;
  *best_dx = bx;
  *best_dy = by;
}

// NaN-aware 2x block-mean downsample (dsmr.py:16-46), single channel.
void downsample2x(const double* u, int64_t h, int64_t w, double* out) {
  const int64_t oh = (h + 1) / 2, ow = (w + 1) / 2;
#pragma omp parallel for schedule(static)
  for (int64_t j = 0; j < oh; ++j) {
    for (int64_t i = 0; i < ow; ++i) {
      double s = 0;
      int c = 0;
      for (int dj = 0; dj < 2; ++dj)
        for (int di = 0; di < 2; ++di) {
          const int64_t jj = 2 * j + dj, ii = 2 * i + di;
          if (jj < h && ii < w) {
            const double t = u[jj * w + ii];
            if (std::isfinite(t)) { s += t; ++c; }
          }
        }
      out[j * ow + i] = c > 0 ? s / c : std::numeric_limits<double>::quiet_NaN();
    }
  }
}

}  // extern "C"
