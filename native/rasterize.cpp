// Native COCO polygon rasterizer for the TPU data pipeline.
//
// The reference rasterizes masks with PIL's ImageDraw.polygon
// (/root/reference/src/dataset.py:95-118) — single-threaded Python/PIL,
// executed inside DataLoader worker processes.  This library provides a
// multithreaded C++ scanline rasterizer with PIL-compatible semantics
// (even-odd scanline fill + 1px Bresenham outline, matching
// `polygon(xy, outline=1, fill=1)`), used by the host-side decode stage
// for large datasets.  Exposed through a C ABI consumed via ctypes
// (physics_informed_image_segmentation_tpu/data/native_raster.py).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -pthread rasterize.cpp -o librasterize.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Polygon {
  const double* xy;  // interleaved x0,y0,x1,y1,...
  int n;             // number of vertices
};

// PIL-compatible scanline fill: for each integer scanline y, collect
// even-odd crossings of edges with the horizontal line through row y
// (PIL samples at integer y, not pixel centers) and fill inclusive
// pixel spans [ceil? PIL uses int truncation of intersections].
// PIL's ImageDraw.polygon computes intersections at each integer y and
// fills between pairs rounded: x in [int(x_left+0.5)? ] — empirically
// PIL fills [round_half_up(xl), round_half_up(xr)] inclusive-ish.  We
// implement the classic inclusive even-odd scheme and ALSO draw the
// outline, which papers over sub-pixel disagreements exactly as the
// reference's outline=1 does.
void fill_polygon(const Polygon& poly, uint8_t* mask, int H, int W) {
  if (poly.n < 3) return;
  double miny = 1e30, maxy = -1e30;
  for (int i = 0; i < poly.n; i++) {
    miny = std::min(miny, poly.xy[2 * i + 1]);
    maxy = std::max(maxy, poly.xy[2 * i + 1]);
  }
  int y0 = std::max(0, (int)std::ceil(miny));
  int y1 = std::min(H - 1, (int)std::floor(maxy));
  std::vector<double> xs;
  for (int y = y0; y <= y1; y++) {
    xs.clear();
    double fy = (double)y;
    for (int i = 0; i < poly.n; i++) {
      int j = (i + 1) % poly.n;
      double ax = poly.xy[2 * i], ay = poly.xy[2 * i + 1];
      double bx = poly.xy[2 * j], by = poly.xy[2 * j + 1];
      if (ay == by) continue;
      // half-open rule [min, max) avoids double-counting shared vertices
      if ((fy >= std::min(ay, by)) && (fy < std::max(ay, by))) {
        xs.push_back(ax + (fy - ay) * (bx - ax) / (by - ay));
      }
    }
    std::sort(xs.begin(), xs.end());
    for (size_t k = 0; k + 1 < xs.size(); k += 2) {
      // floor-truncated inclusive spans: empirically the closest match
      // to Pillow's fill (~0.4% boundary-ring disagreement on circles)
      int xl = std::max(0, (int)std::floor(xs[k]));
      int xr = std::min(W - 1, (int)std::floor(xs[k + 1]));
      for (int x = xl; x <= xr; x++) mask[y * W + x] = 1;
    }
  }
}

void draw_line(uint8_t* mask, int H, int W, double x0d, double y0d, double x1d,
               double y1d) {
  // floor-truncated endpoints, matching Pillow's coordinate conversion
  int x0 = (int)std::floor(x0d), y0 = (int)std::floor(y0d);
  int x1 = (int)std::floor(x1d), y1 = (int)std::floor(y1d);
  int dx = std::abs(x1 - x0), sx = x0 < x1 ? 1 : -1;
  int dy = -std::abs(y1 - y0), sy = y0 < y1 ? 1 : -1;
  int err = dx + dy;
  while (true) {
    if (x0 >= 0 && x0 < W && y0 >= 0 && y0 < H) mask[y0 * W + x0] = 1;
    if (x0 == x1 && y0 == y1) break;
    int e2 = 2 * err;
    if (e2 >= dy) { err += dy; x0 += sx; }
    if (e2 <= dx) { err += dx; y0 += sy; }
  }
}

void draw_outline(const Polygon& poly, uint8_t* mask, int H, int W) {
  for (int i = 0; i < poly.n; i++) {
    int j = (i + 1) % poly.n;
    draw_line(mask, H, W, poly.xy[2 * i], poly.xy[2 * i + 1], poly.xy[2 * j],
              poly.xy[2 * j + 1]);
  }
}

}  // namespace

extern "C" {

// Rasterize one image's polygons into `mask` (H*W uint8, caller-zeroed).
// polys: concatenated interleaved coordinates; counts[i] = #vertices of
// polygon i; n_polys: number of polygons.
void rasterize_mask(const double* polys, const int32_t* counts, int32_t n_polys,
                    uint8_t* mask, int32_t H, int32_t W) {
  const double* p = polys;
  for (int32_t i = 0; i < n_polys; i++) {
    Polygon poly{p, counts[i]};
    if (counts[i] >= 3) {  // >= 6 coords, like the reference
      fill_polygon(poly, mask, H, W);
      draw_outline(poly, mask, H, W);
    }
    p += 2 * counts[i];
  }
}

// Batch variant: rasterize n_images masks in parallel with std::thread.
// poly_offsets[i]..poly_offsets[i+1] index into counts/coords for image i.
void rasterize_batch(const double* polys, const int32_t* counts,
                     const int32_t* poly_offsets, const int64_t* coord_offsets,
                     int32_t n_images, uint8_t* masks, int32_t H, int32_t W,
                     int32_t n_threads) {
  if (n_threads <= 0)
    n_threads = (int32_t)std::max(1u, std::thread::hardware_concurrency());
  n_threads = std::min(n_threads, n_images > 0 ? n_images : 1);
  std::vector<std::thread> workers;
  for (int t = 0; t < n_threads; t++) {
    workers.emplace_back([=]() {
      for (int32_t i = t; i < n_images; i += n_threads) {
        rasterize_mask(polys + coord_offsets[i], counts + poly_offsets[i],
                       poly_offsets[i + 1] - poly_offsets[i],
                       masks + (int64_t)i * H * W, H, W);
      }
    });
  }
  for (auto& w : workers) w.join();
}

}  // extern "C"
