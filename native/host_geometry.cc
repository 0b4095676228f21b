// Native host-geometry kernels (C ABI, loaded via ctypes).
//
// The TPU handles all per-candidate math; these routines cover the *host-side*
// scenario preprocessing that the reference delegated to C++ wheels
// (commonroad-drivability-checker's triangulated road boundary,
// planner.py:554-565; shapely/pygeos polygon work):
//
//   - corridor_scan: drivable-corridor tables d_min(s)/d_max(s) along the
//     reference path (frenetix_tpu.geometry.corridor semantics) — the pure-
//     Python version costs ~2 s per reference path, this ~10 ms.
//   - points_in_polygons: batched even-odd point-in-union test.
//   - rasterize_polylines: brightness raster of boundary polylines in a
//     vehicle frame (Wale-Net scene image, preprocessing.py:17-194).
//
// Build: `make` (g++ -O3 -shared); frenetix_tpu.native falls back to the
// NumPy implementations when the library has not been built.
#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// Even-odd test of one point against one polygon ring.
static bool point_in_ring(double px, double py, const double* ring, int n) {
    bool inside = false;
    for (int i = 0, j = n - 1; i < n; j = i++) {
        double ax = ring[2 * i], ay = ring[2 * i + 1];
        double bx = ring[2 * j], by = ring[2 * j + 1];
        if ((ay > py) != (by > py)) {
            double x_int = ax + (py - ay) * (bx - ax) / (by - ay);
            if (px < x_int) inside = !inside;
        }
    }
    return inside;
}

static bool point_in_union(double px, double py, const double* polys,
                           const int64_t* offsets, int n_polys) {
    for (int p = 0; p < n_polys; ++p) {
        const double* ring = polys + 2 * offsets[p];
        int n = static_cast<int>(offsets[p + 1] - offsets[p]);
        if (point_in_ring(px, py, ring, n)) return true;
    }
    return false;
}

// points (P, 2) vs. union of polygons (concatenated rings + offsets (n+1,)).
// Per-ring bounding boxes are precomputed once: on reach-grid rasters most
// cells fall outside most lanelets' boxes, turning the scan from
// O(P * total_vertices) into ~O(P * n_polys).
void points_in_polygons(const double* points, int64_t n_points,
                        const double* polys, const int64_t* offsets,
                        int64_t n_polys, uint8_t* out) {
    int np = static_cast<int>(n_polys);
    std::vector<double> bbox(4 * np);
    for (int p = 0; p < np; ++p) {
        const double* ring = polys + 2 * offsets[p];
        int n = static_cast<int>(offsets[p + 1] - offsets[p]);
        double xmin = 1e300, xmax = -1e300, ymin = 1e300, ymax = -1e300;
        for (int i = 0; i < n; ++i) {
            double x = ring[2 * i], y = ring[2 * i + 1];
            if (x < xmin) xmin = x;
            if (x > xmax) xmax = x;
            if (y < ymin) ymin = y;
            if (y > ymax) ymax = y;
        }
        bbox[4 * p] = xmin; bbox[4 * p + 1] = xmax;
        bbox[4 * p + 2] = ymin; bbox[4 * p + 3] = ymax;
    }
    for (int64_t i = 0; i < n_points; ++i) {
        double px = points[2 * i], py = points[2 * i + 1];
        uint8_t hit = 0;
        for (int p = 0; p < np; ++p) {
            if (px < bbox[4 * p] || px > bbox[4 * p + 1] ||
                py < bbox[4 * p + 2] || py > bbox[4 * p + 3]) continue;
            const double* ring = polys + 2 * offsets[p];
            int n = static_cast<int>(offsets[p + 1] - offsets[p]);
            if (point_in_ring(px, py, ring, n)) { hit = 1; break; }
        }
        out[i] = hit;
    }
}

// Drivable corridor: for each ref-path vertex, scan d in [-d_max, d_max] at
// d_step along the normal and return the contiguous free interval around d=0
// expanded by d_step/2 (geometry/corridor.py:corridor_from_polygons).
void corridor_scan(const double* xy, const double* theta, int64_t r,
                   const double* polys, const int64_t* offsets, int64_t n_polys,
                   double d_max, double d_step, double* out /* (r, 2) */) {
    int k = static_cast<int>(std::floor(2.0 * d_max / d_step)) + 1;
    int zero_idx = k / 2;
    std::vector<uint8_t> row(k);
    for (int64_t i = 0; i < r; ++i) {
        double nx = -std::sin(theta[i]);
        double ny = std::cos(theta[i]);
        double cx = xy[2 * i], cy = xy[2 * i + 1];
        for (int j = 0; j < k; ++j) {
            double d = -d_max + j * d_step;
            row[j] = point_in_union(cx + d * nx, cy + d * ny, polys, offsets,
                                    static_cast<int>(n_polys));
        }
        out[2 * i] = 0.0;
        out[2 * i + 1] = 0.0;
        if (!row[zero_idx]) continue;  // path point itself off-road
        int lo = zero_idx, hi = zero_idx;
        while (lo > 0 && row[lo - 1]) --lo;
        while (hi < k - 1 && row[hi + 1]) ++hi;
        out[2 * i] = (-d_max + lo * d_step) - d_step / 2.0;
        out[2 * i + 1] = (-d_max + hi * d_step) + d_step / 2.0;
    }
}

// Rasterize boundary polylines into a res x res image in the frame given by
// (pos, orient): rel = R(-orient) (p - pos); pixel = rel // pixel_dist + res/2.
// lines: concatenated (V_i, 2) vertices; offsets (n+1,); values (n,).
void rasterize_polylines(const double* lines, const int64_t* offsets,
                         const double* values, int64_t n_lines,
                         double pos_x, double pos_y, double orient,
                         double watch_radius, int res, float* img /* res*res */) {
    double pixel_dist = 2.0 * watch_radius / res;
    double step = pixel_dist * 0.8;
    double c = std::cos(orient), s = std::sin(orient);
    for (int64_t li = 0; li < n_lines; ++li) {
        const double* v = lines + 2 * offsets[li];
        int n = static_cast<int>(offsets[li + 1] - offsets[li]);
        float value = static_cast<float>(values[li]);
        double px_prev = 0, py_prev = 0;
        bool have_prev = false;
        for (int i = 0; i < n; ++i) {
            double dx = v[2 * i] - pos_x, dy = v[2 * i + 1] - pos_y;
            double rx = c * dx + s * dy;
            double ry = -s * dx + c * dy;
            if (std::fabs(rx) > watch_radius * 1.5 ||
                std::fabs(ry) > watch_radius * 1.5) {
                have_prev = false;
                continue;
            }
            if (have_prev) {
                double seg = std::hypot(rx - px_prev, ry - py_prev);
                int n_sub = std::max(1, static_cast<int>(seg / step));
                for (int t = 0; t <= n_sub; ++t) {
                    double f = static_cast<double>(t) / n_sub;
                    double x = px_prev + f * (rx - px_prev);
                    double y = py_prev + f * (ry - py_prev);
                    int px = static_cast<int>(std::floor(x / pixel_dist) + res / 2);
                    int py = static_cast<int>(std::floor(y / pixel_dist) + res / 2);
                    if (px >= 0 && px < res && py >= 0 && py < res)
                        img[py * res + px] = value;
                }
            }
            px_prev = rx;
            py_prev = ry;
            have_prev = true;
        }
    }
}

}  // extern "C"
