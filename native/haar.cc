// Viola-Jones Haar cascade face detector (C++ core).
//
// OpenCV 5 removed CascadeClassifier, but the cascade XML data files still
// ship with the distro; this implements the classic boosted-cascade
// evaluator over integral images so the framework keeps the reference's
// OpenCV-cascade detection tier (/root/reference/app/preprocessing/
// face_detection.py:236-328) without depending on removed OpenCV APIs.
//
// The cascade is passed in as flat arrays (parsed from XML in Python, see
// lipsync_tpu/preprocessing/haar.py). Evaluation follows the standard
// algorithm: scale pyramid over the image (bilinear), integral + squared
// integral per scale, sliding 24x24-equivalent window with variance
// normalization, small-tree weak classifiers, then min-neighbors grouping.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Cascade {
  int win_w, win_h;
  int n_stages;
  const float* stage_thresholds;
  const int32_t* stage_first_weak;
  const int32_t* stage_nweak;
  const int32_t* weak_first_node;
  const int32_t* weak_first_leaf;
  const int32_t* node_left;    // child index within weak (or ~leaf)
  const int32_t* node_right;
  const int32_t* node_feature;
  const float* node_threshold;
  const float* leaves;
  const int32_t* feat_nrects;       // (F,)
  const float* feat_rects;          // (F, 3, 5): x,y,w,h,weight
};

struct Rect {
  int x, y, w, h;
};

inline double rect_sum(const double* integral, int stride, int x, int y,
                       int w, int h) {
  return integral[y * stride + x] + integral[(y + h) * stride + (x + w)] -
         integral[y * stride + (x + w)] - integral[(y + h) * stride + x];
}

// Evaluate the cascade at window (wx, wy) on the (scaled) integral images.
bool eval_window(const Cascade& c, const double* integral,
                 const double* sq_integral, int stride, int wx, int wy) {
  const double area = (double)c.win_w * c.win_h;
  const double inv_area = 1.0 / area;
  double mean = rect_sum(integral, stride, wx, wy, c.win_w, c.win_h) * inv_area;
  double var =
      rect_sum(sq_integral, stride, wx, wy, c.win_w, c.win_h) * inv_area -
      mean * mean;
  double var_norm = var > 0 ? std::sqrt(var) : 1.0;

  for (int s = 0; s < c.n_stages; ++s) {
    double stage_sum = 0.0;
    int first_weak = c.stage_first_weak[s];
    int nweak = c.stage_nweak[s];
    for (int k = 0; k < nweak; ++k) {
      int w_idx = first_weak + k;
      int node0 = c.weak_first_node[w_idx];
      int leaf0 = c.weak_first_leaf[w_idx];
      int node = 0;
      // Walk the (tiny) decision tree. OpenCV node encoding: child index
      // > 0 is the next internal node; <= 0 is a leaf with index -child
      // (cascadedetect predictOrdered: `while (idx > 0)` then
      // `leaves[leafOfs - idx]`).
      for (;;) {
        int n_idx = node0 + node;
        int f = c.node_feature[n_idx];
        const float* rects = c.feat_rects + (size_t)f * 15;
        int nrects = c.feat_nrects[f];
        double fsum = 0.0;
        for (int r = 0; r < nrects; ++r) {
          const float* rr = rects + r * 5;
          fsum += rr[4] * rect_sum(integral, stride, wx + (int)rr[0],
                                   wy + (int)rr[1], (int)rr[2], (int)rr[3]);
        }
        double val = fsum * inv_area;
        int next = (val < c.node_threshold[n_idx] * var_norm)
                       ? c.node_left[n_idx]
                       : c.node_right[n_idx];
        if (next <= 0) {
          stage_sum += c.leaves[leaf0 + (-next)];
          break;
        }
        node = next;
      }
    }
    if (stage_sum < c.stage_thresholds[s]) return false;
  }
  return true;
}

void bilinear_resize_gray(const uint8_t* src, int sh, int sw, uint8_t* dst,
                          int dh, int dw) {
  const double sx = (double)sw / dw;
  const double sy = (double)sh / dh;
  for (int y = 0; y < dh; ++y) {
    double fy = (y + 0.5) * sy - 0.5;
    fy = std::max(0.0, std::min(fy, (double)sh - 1));
    int y0 = (int)fy;
    int y1 = std::min(y0 + 1, sh - 1);
    double wy = fy - y0;
    for (int x = 0; x < dw; ++x) {
      double fx = (x + 0.5) * sx - 0.5;
      fx = std::max(0.0, std::min(fx, (double)sw - 1));
      int x0 = (int)fx;
      int x1 = std::min(x0 + 1, sw - 1);
      double wx = fx - x0;
      double top = src[y0 * sw + x0] * (1 - wx) + src[y0 * sw + x1] * wx;
      double bot = src[y1 * sw + x0] * (1 - wx) + src[y1 * sw + x1] * wx;
      dst[y * dw + x] = (uint8_t)(top * (1 - wy) + bot * wy + 0.5);
    }
  }
}

void compute_integrals(const uint8_t* img, int h, int w, double* integral,
                       double* sq_integral) {
  int stride = w + 1;
  std::memset(integral, 0, sizeof(double) * stride);
  std::memset(sq_integral, 0, sizeof(double) * stride);
  for (int y = 0; y < h; ++y) {
    double row = 0, sqrow = 0;
    integral[(y + 1) * stride] = 0;
    sq_integral[(y + 1) * stride] = 0;
    for (int x = 0; x < w; ++x) {
      double v = img[y * w + x];
      row += v;
      sqrow += v * v;
      integral[(y + 1) * stride + x + 1] = integral[y * stride + x + 1] + row;
      sq_integral[(y + 1) * stride + x + 1] =
          sq_integral[y * stride + x + 1] + sqrow;
    }
  }
}

// Union-find rectangle grouping (OpenCV groupRectangles semantics:
// similarity eps=0.2, keep clusters with >= min_neighbors members,
// output the cluster average box).
int group_rectangles(std::vector<Rect>& rects, int min_neighbors,
                     double eps = 0.2) {
  int n = (int)rects.size();
  if (n == 0) return 0;
  std::vector<int> parent(n);
  for (int i = 0; i < n; ++i) parent[i] = i;
  auto find = [&parent](int i) {
    while (parent[i] != i) {
      parent[i] = parent[parent[i]];
      i = parent[i];
    }
    return i;
  };
  auto similar = [&](const Rect& a, const Rect& b) {
    double delta = eps * (std::min(a.w, b.w) + std::min(a.h, b.h)) * 0.5;
    return std::abs(a.x - b.x) <= delta && std::abs(a.y - b.y) <= delta &&
           std::abs(a.x + a.w - b.x - b.w) <= delta &&
           std::abs(a.y + a.h - b.y - b.h) <= delta;
  };
  for (int i = 0; i < n; ++i)
    for (int j = i + 1; j < n; ++j)
      if (similar(rects[i], rects[j])) {
        int ri = find(i), rj = find(j);
        if (ri != rj) parent[ri] = rj;
      }

  std::vector<int> count(n, 0);
  std::vector<double> sx(n, 0), sy(n, 0), sw_(n, 0), sh_(n, 0);
  for (int i = 0; i < n; ++i) {
    int r = find(i);
    count[r]++;
    sx[r] += rects[i].x;
    sy[r] += rects[i].y;
    sw_[r] += rects[i].w;
    sh_[r] += rects[i].h;
  }
  std::vector<Rect> out;
  for (int i = 0; i < n; ++i) {
    if (find(i) != i) continue;
    if (count[i] < min_neighbors) continue;
    double inv = 1.0 / count[i];
    out.push_back({(int)(sx[i] * inv + 0.5), (int)(sy[i] * inv + 0.5),
                   (int)(sw_[i] * inv + 0.5), (int)(sh_[i] * inv + 0.5)});
  }
  rects = out;
  return (int)out.size();
}

}  // namespace

extern "C" {

// Detect faces in a grayscale image. Returns number of boxes written to
// out_boxes as (x, y, w, h) int32 quadruples.
int64_t haar_detect(
    const uint8_t* gray, int32_t height, int32_t width,
    // cascade arrays:
    int32_t win_w, int32_t win_h, int32_t n_stages,
    const float* stage_thresholds, const int32_t* stage_first_weak,
    const int32_t* stage_nweak, const int32_t* weak_first_node,
    const int32_t* weak_first_leaf, const int32_t* node_left,
    const int32_t* node_right, const int32_t* node_feature,
    const float* node_threshold, const float* leaves,
    const int32_t* feat_nrects, const float* feat_rects,
    // detection params:
    double scale_factor, int32_t min_neighbors, int32_t min_size,
    int32_t step,
    int32_t* out_boxes, int64_t max_out) {
  Cascade c{win_w, win_h, n_stages, stage_thresholds, stage_first_weak,
            stage_nweak, weak_first_node, weak_first_leaf, node_left,
            node_right, node_feature, node_threshold, leaves, feat_nrects,
            feat_rects};

  std::vector<Rect> found;
  std::vector<uint8_t> scaled;
  std::vector<double> integral, sq_integral;

  for (double scale = 1.0;; scale *= scale_factor) {
    int sw = (int)(width / scale + 0.5);
    int sh = (int)(height / scale + 0.5);
    if (sw < win_w || sh < win_h) break;
    int det_size = (int)(win_w * scale + 0.5);
    if (det_size < min_size) continue;

    scaled.resize((size_t)sw * sh);
    if (scale == 1.0)
      std::memcpy(scaled.data(), gray, (size_t)sw * sh);
    else
      bilinear_resize_gray(gray, height, width, scaled.data(), sh, sw);

    int stride = sw + 1;
    integral.resize((size_t)stride * (sh + 1));
    sq_integral.resize((size_t)stride * (sh + 1));
    compute_integrals(scaled.data(), sh, sw, integral.data(),
                      sq_integral.data());

    for (int y = 0; y + win_h <= sh; y += step) {
      for (int x = 0; x + win_w <= sw; x += step) {
        if (eval_window(c, integral.data(), sq_integral.data(), stride, x,
                        y)) {
          found.push_back({(int)(x * scale + 0.5), (int)(y * scale + 0.5),
                           (int)(win_w * scale + 0.5),
                           (int)(win_h * scale + 0.5)});
        }
      }
    }
  }

  group_rectangles(found, min_neighbors);
  int64_t n = std::min((int64_t)found.size(), max_out);
  for (int64_t i = 0; i < n; ++i) {
    out_boxes[i * 4 + 0] = found[i].x;
    out_boxes[i * 4 + 1] = found[i].y;
    out_boxes[i * 4 + 2] = found[i].w;
    out_boxes[i * 4 + 3] = found[i].h;
  }
  return n;
}

}  // extern "C"
