// Native BEV rasterization core.
//
// The hot loop of the offline preprocessing pipeline
// (bevgen_tpu/data/rasterize.py — reference argoverse_preprocess.py):
// polygon fills and polyline draws over 256x256 uint8 rasters, called
// tens of thousands of times per dataset pass. Self-contained C++
// (no OpenCV dependency) exposed over a C ABI for ctypes.
//
// Semantics: even-odd scanline polygon fill with half-open pixel-center
// sampling and Bresenham polylines — matching cv2.fillPoly /
// cv2.polylines on simple polygons to within boundary-pixel rounding
// (parity-tested against cv2 in tests/test_native.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// points: flat (x, y) int32 pairs; lens[i] = #points of polygon i.
// out: h*w uint8 raster (row-major), filled pixels set to `value`.
void fill_polygons(const int32_t* points, const int32_t* lens,
                   int32_t n_polys, uint8_t* out, int32_t h, int32_t w,
                   uint8_t value) {
  const int32_t* p = points;
  std::vector<double> xs;
  for (int32_t pi = 0; pi < n_polys; ++pi) {
    const int32_t n = lens[pi];
    if (n < 3) { p += 2 * n; continue; }
    // bounding rows
    int32_t ymin = p[1], ymax = p[1];
    for (int32_t i = 0; i < n; ++i) {
      ymin = std::min(ymin, p[2 * i + 1]);
      ymax = std::max(ymax, p[2 * i + 1]);
    }
    ymin = std::max(ymin, (int32_t)0);
    ymax = std::min(ymax, h - 1);
    for (int32_t y = ymin; y <= ymax; ++y) {
      const double yc = (double)y;  // sample at integer rows (cv2-like)
      xs.clear();
      for (int32_t i = 0; i < n; ++i) {
        const double x0 = p[2 * i], y0 = p[2 * i + 1];
        const int32_t j = (i + 1) % n;
        const double x1 = p[2 * j], y1 = p[2 * j + 1];
        if ((y0 <= yc && y1 > yc) || (y1 <= yc && y0 > yc)) {
          xs.push_back(x0 + (yc - y0) / (y1 - y0) * (x1 - x0));
        }
      }
      std::sort(xs.begin(), xs.end());
      for (size_t k = 0; k + 1 < xs.size(); k += 2) {
        int32_t xa = (int32_t)std::max(0.0, std::ceil(xs[k] - 0.5));
        int32_t xb = (int32_t)std::min((double)w - 1,
                                       std::floor(xs[k + 1] + 0.5));
        for (int32_t x = xa; x <= xb; ++x) out[y * w + x] = value;
      }
    }
    // boundary: rasterize edges too (cv2.fillPoly includes outlines)
    for (int32_t i = 0; i < n; ++i) {
      const int32_t j = (i + 1) % n;
      int32_t x0 = p[2 * i], y0 = p[2 * i + 1];
      int32_t x1 = p[2 * j], y1 = p[2 * j + 1];
      int32_t dx = std::abs(x1 - x0), dy = -std::abs(y1 - y0);
      int32_t sx = x0 < x1 ? 1 : -1, sy = y0 < y1 ? 1 : -1, err = dx + dy;
      while (true) {
        if (x0 >= 0 && x0 < w && y0 >= 0 && y0 < h) out[y0 * w + x0] = value;
        if (x0 == x1 && y0 == y1) break;
        int32_t e2 = 2 * err;
        if (e2 >= dy) { err += dy; x0 += sx; }
        if (e2 <= dx) { err += dx; y0 += sy; }
      }
    }
    p += 2 * n;
  }
}

// Bresenham polylines (open), 1px.
void draw_polylines(const int32_t* points, const int32_t* lens,
                    int32_t n_lines, uint8_t* out, int32_t h, int32_t w,
                    uint8_t value) {
  const int32_t* p = points;
  for (int32_t li = 0; li < n_lines; ++li) {
    const int32_t n = lens[li];
    for (int32_t i = 0; i + 1 < n; ++i) {
      int32_t x0 = p[2 * i], y0 = p[2 * i + 1];
      int32_t x1 = p[2 * i + 2], y1 = p[2 * i + 3];
      int32_t dx = std::abs(x1 - x0), dy = -std::abs(y1 - y0);
      int32_t sx = x0 < x1 ? 1 : -1, sy = y0 < y1 ? 1 : -1, err = dx + dy;
      while (true) {
        if (x0 >= 0 && x0 < w && y0 >= 0 && y0 < h) out[y0 * w + x0] = value;
        if (x0 == x1 && y0 == y1) break;
        int32_t e2 = 2 * err;
        if (e2 >= dy) { err += dy; x0 += sx; }
        if (e2 <= dx) { err += dx; y0 += sy; }
      }
    }
    p += 2 * n;
  }
}

}  // extern "C"
