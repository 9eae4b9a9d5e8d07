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
//
// Hot-path design (the serving pipeline is host-detection-bound):
//  * feature rects are resolved ONCE PER SCALE into flat integral-image
//    offsets (OpenCV's setImage trick) — the per-window evaluation is
//    pure pointer arithmetic on a uint32 integral image;
//  * all shipped OpenCV face cascades are pure STUMPS (one node per weak
//    classifier, verified at load), which removes the tree walk: each
//    weak is feature -> compare -> add one of two leaves;
//  * on AVX-512 hosts, 16 adjacent windows evaluate per vector iteration
//    with masked early-exit (per-lane math identical to the scalar path,
//    so results are bitwise equal — tested via HAAR_FORCE_SCALAR).
// Generic tree cascades fall back to the per-window tree walker.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

#if defined(__AVX512F__)
#include <immintrin.h>
// _mm512_cvtepi32_ps expands through _mm512_undefined_ps(), which gcc's
// -Wmaybe-uninitialized flags as a false positive (gcc bug 105593).
#pragma GCC diagnostic ignored "-Wmaybe-uninitialized"
#endif

namespace {

struct Cascade {
  int win_w, win_h;
  int n_stages;
  const float* stage_thresholds;
  const int32_t* stage_first_weak;
  const int32_t* stage_nweak;
  const int32_t* weak_first_node;
  const int32_t* weak_first_leaf;
  const int32_t* node_left;    // child index within weak (or <=0: leaf)
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

// ── per-scale resolved tables ───────────────────────────────────────────

// Generic tree node: rect corners as flat offsets from the window's
// top-left corner in the integral image. 3 rects max; unused rects have
// weight 0 and offsets 0 (their gather is a no-op).
struct NodeT {
  int32_t a[3], b[3], c[3], d[3];  // corner offsets: sum = A + D - B - C
  float w[3];
  float threshold;
  int32_t left, right;
};

// Stump weak classifier (all OpenCV face cascades): one node, two leaves.
struct StumpW {
  int32_t a[3], b[3], c[3], d[3];
  float w[3];
  float threshold;
  float leaf_lt, leaf_ge;  // feature < thr*var_norm ? leaf_lt : leaf_ge
  int32_t nrects;
};

void resolve_rects(const Cascade& c, int feature, int stride, int32_t* a,
                   int32_t* b, int32_t* cc, int32_t* d, float* w,
                   int* nrects_out) {
  int nrects = c.feat_nrects[feature];
  const float* rects = c.feat_rects + (size_t)feature * 15;
  for (int r = 0; r < 3; ++r) {
    if (r < nrects) {
      const float* rr = rects + r * 5;
      int x = (int)rr[0], y = (int)rr[1], rw = (int)rr[2], rh = (int)rr[3];
      a[r] = y * stride + x;
      b[r] = y * stride + (x + rw);
      cc[r] = (y + rh) * stride + x;
      d[r] = (y + rh) * stride + (x + rw);
      w[r] = rr[4];
    } else {
      a[r] = b[r] = cc[r] = d[r] = 0;
      w[r] = 0.0f;
    }
  }
  if (nrects_out) *nrects_out = nrects;
}

void build_node_table(const Cascade& c, int n_nodes, int stride,
                      std::vector<NodeT>& table) {
  table.resize(n_nodes);
  for (int i = 0; i < n_nodes; ++i) {
    NodeT& n = table[i];
    resolve_rects(c, c.node_feature[i], stride, n.a, n.b, n.c, n.d, n.w,
                  nullptr);
    n.threshold = c.node_threshold[i];
    n.left = c.node_left[i];
    n.right = c.node_right[i];
  }
}

void build_stump_table(const Cascade& c, int n_weak, int stride,
                       std::vector<StumpW>& table) {
  table.resize(n_weak);
  for (int i = 0; i < n_weak; ++i) {
    StumpW& s = table[i];
    int node = c.weak_first_node[i];  // == i for pure-stump cascades
    resolve_rects(c, c.node_feature[node], stride, s.a, s.b, s.c, s.d, s.w,
                  &s.nrects);
    s.threshold = c.node_threshold[node];
    int leaf0 = c.weak_first_leaf[i];
    s.leaf_lt = c.leaves[leaf0 + (-c.node_left[node])];
    s.leaf_ge = c.leaves[leaf0 + (-c.node_right[node])];
  }
}

// ── window evaluation ───────────────────────────────────────────────────

inline float window_var_norm(const uint32_t* p, const uint64_t* psq, int wb,
                             int wc, int wd, float inv_area) {
  double total = (double)(p[0] + p[wd] - p[wb] - p[wc]);
  double sqtotal = (double)(psq[0] + psq[wd] - psq[wb] - psq[wc]);
  double mean = total * inv_area;
  double var = sqtotal * inv_area - mean * mean;
  return var > 0 ? (float)std::sqrt(var) : 1.0f;
}

inline float rect_sum_f(const uint32_t* p, const int32_t* a, const int32_t* b,
                        const int32_t* c, const int32_t* d, int r) {
  return (float)(int32_t)(p[a[r]] + p[d[r]] - p[b[r]] - p[c[r]]);
}

// Generic tree cascade at one window (top-left integral pointer `p`).
bool eval_window_tree(const Cascade& c, const std::vector<NodeT>& nodes,
                      const uint32_t* p, float var_norm, float inv_area) {
  for (int s = 0; s < c.n_stages; ++s) {
    float stage_sum = 0.0f;
    int first_weak = c.stage_first_weak[s];
    int end_weak = first_weak + c.stage_nweak[s];
    for (int w_idx = first_weak; w_idx < end_weak; ++w_idx) {
      int node0 = c.weak_first_node[w_idx];
      int leaf0 = c.weak_first_leaf[w_idx];
      int node = 0;
      // Walk the (tiny) decision tree. OpenCV node encoding: child index
      // > 0 is the next internal node; <= 0 is a leaf with index -child.
      for (;;) {
        const NodeT& n = nodes[node0 + node];
        float fsum = n.w[0] * rect_sum_f(p, n.a, n.b, n.c, n.d, 0) +
                     n.w[1] * rect_sum_f(p, n.a, n.b, n.c, n.d, 1) +
                     n.w[2] * rect_sum_f(p, n.a, n.b, n.c, n.d, 2);
        int next = (fsum * inv_area < n.threshold * var_norm) ? n.left
                                                              : n.right;
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

// Stump cascade at one window.
bool eval_window_stump(const Cascade& c, const std::vector<StumpW>& stumps,
                       const uint32_t* p, float var_norm, float inv_area) {
  for (int s = 0; s < c.n_stages; ++s) {
    float stage_sum = 0.0f;
    int w_idx = c.stage_first_weak[s];
    int end_weak = w_idx + c.stage_nweak[s];
    for (; w_idx < end_weak; ++w_idx) {
      const StumpW& st = stumps[w_idx];
      float fsum = st.w[0] * rect_sum_f(p, st.a, st.b, st.c, st.d, 0) +
                   st.w[1] * rect_sum_f(p, st.a, st.b, st.c, st.d, 1);
      if (st.nrects > 2)
        fsum += st.w[2] * rect_sum_f(p, st.a, st.b, st.c, st.d, 2);
      stage_sum += (fsum * inv_area < st.threshold * var_norm) ? st.leaf_lt
                                                               : st.leaf_ge;
    }
    if (stage_sum < c.stage_thresholds[s]) return false;
  }
  return true;
}

#if defined(__AVX512F__)

// Load 16 uint32 lane values for adjacent windows: lane k reads
// base[k * STEP]. STEP 1 is a plain load; STEP 2 deinterleaves two
// contiguous vectors (linear loads beat vpgatherdd by a wide margin).
inline __m512i even_index_vec() {
  alignas(64) int32_t idx[16];
  for (int i = 0; i < 16; ++i) idx[i] = 2 * i;  // 0..14 from lo, 16.. hi
  return _mm512_load_si512(idx);
}

template <int STEP>
inline __m512i lane_load(const uint32_t* base, __m512i even_idx) {
  if constexpr (STEP == 1) {
    (void)even_idx;
    return _mm512_loadu_si512(base);
  } else {
    __m512i lo = _mm512_loadu_si512(base);
    __m512i hi = _mm512_loadu_si512(base + 16);
    return _mm512_permutex2var_epi32(lo, even_idx, hi);
  }
}

// Evaluate a stump cascade on 16 adjacent windows starting at integral
// pointer `p` (lane k's window at p + k*STEP). Returns a survivors mask.
// Per-lane arithmetic matches eval_window_stump exactly (same op order),
// so results are bitwise identical to the scalar path.
template <int STEP>
uint16_t eval_block_stump16(const Cascade& c,
                            const std::vector<StumpW>& stumps,
                            const uint32_t* p, const uint64_t* psq, int wb,
                            int wc, int wd, float inv_area,
                            __m512i even_idx) {
  // Variance normalization per lane (scalar: 4 u64 + 4 u32 loads + sqrt —
  // once per window, cheap next to the stage loop).
  alignas(64) float vn[16];
  for (int k = 0; k < 16; ++k)
    vn[k] = window_var_norm(p + k * STEP, psq + k * STEP, wb, wc, wd,
                            inv_area);
  const __m512 var_norm = _mm512_load_ps(vn);
  const __m512 vinv_area = _mm512_set1_ps(inv_area);

  auto rect16 = [&](const StumpW& st, int r) -> __m512 {
    __m512i s = _mm512_add_epi32(lane_load<STEP>(p + st.a[r], even_idx),
                                 lane_load<STEP>(p + st.d[r], even_idx));
    s = _mm512_sub_epi32(s, lane_load<STEP>(p + st.b[r], even_idx));
    s = _mm512_sub_epi32(s, lane_load<STEP>(p + st.c[r], even_idx));
    return _mm512_cvtepi32_ps(s);  // window sums < 2^24: exact
  };

  uint16_t active = 0xFFFF;
  for (int s = 0; s < c.n_stages; ++s) {
    __m512 stage_sum = _mm512_setzero_ps();
    int w_idx = c.stage_first_weak[s];
    int end_weak = w_idx + c.stage_nweak[s];
    for (; w_idx < end_weak; ++w_idx) {
      const StumpW& st = stumps[w_idx];
      __m512 fsum = _mm512_mul_ps(_mm512_set1_ps(st.w[0]), rect16(st, 0));
      fsum = _mm512_fmadd_ps(_mm512_set1_ps(st.w[1]), rect16(st, 1), fsum);
      if (st.nrects > 2)
        fsum = _mm512_fmadd_ps(_mm512_set1_ps(st.w[2]), rect16(st, 2), fsum);
      __mmask16 lt = _mm512_cmp_ps_mask(
          _mm512_mul_ps(fsum, vinv_area),
          _mm512_mul_ps(_mm512_set1_ps(st.threshold), var_norm), _CMP_LT_OQ);
      __m512 leaf = _mm512_mask_blend_ps(lt, _mm512_set1_ps(st.leaf_ge),
                                         _mm512_set1_ps(st.leaf_lt));
      stage_sum = _mm512_add_ps(stage_sum, leaf);
    }
    __mmask16 pass = _mm512_cmp_ps_mask(
        stage_sum, _mm512_set1_ps(c.stage_thresholds[s]), _CMP_NLT_UQ);
    active &= (uint16_t)pass;
    if (!active) break;
  }
  return active;
}

bool host_has_avx512() { return __builtin_cpu_supports("avx512f"); }

#endif  // __AVX512F__

// ── image pyramid ───────────────────────────────────────────────────────

void bilinear_resize_gray(const uint8_t* src, int sh, int sw, uint8_t* dst,
                          int dh, int dw) {
  const double sx = (double)sw / dw;
  const double sy = (double)sh / dh;
  std::vector<int> x0s(dw), x1s(dw);
  std::vector<float> wxs(dw);
  for (int x = 0; x < dw; ++x) {
    double fx = (x + 0.5) * sx - 0.5;
    fx = std::max(0.0, std::min(fx, (double)sw - 1));
    x0s[x] = (int)fx;
    x1s[x] = std::min(x0s[x] + 1, sw - 1);
    wxs[x] = (float)(fx - x0s[x]);
  }
  for (int y = 0; y < dh; ++y) {
    double fy = (y + 0.5) * sy - 0.5;
    fy = std::max(0.0, std::min(fy, (double)sh - 1));
    int y0 = (int)fy;
    int y1 = std::min(y0 + 1, sh - 1);
    float wy = (float)(fy - y0);
    const uint8_t* r0 = src + (size_t)y0 * sw;
    const uint8_t* r1 = src + (size_t)y1 * sw;
    uint8_t* out = dst + (size_t)y * dw;
    for (int x = 0; x < dw; ++x) {
      float wx = wxs[x];
      float top = r0[x0s[x]] * (1 - wx) + r0[x1s[x]] * wx;
      float bot = r1[x0s[x]] * (1 - wx) + r1[x1s[x]] * wx;
      out[x] = (uint8_t)(top * (1 - wy) + bot * wy + 0.5f);
    }
  }
}

void compute_integrals(const uint8_t* img, int h, int w, uint32_t* integral,
                       uint64_t* sq_integral) {
  int stride = w + 1;
  std::memset(integral, 0, sizeof(uint32_t) * stride);
  std::memset(sq_integral, 0, sizeof(uint64_t) * stride);
  for (int y = 0; y < h; ++y) {
    uint32_t row = 0;
    uint64_t sqrow = 0;
    const uint8_t* src = img + (size_t)y * w;
    uint32_t* cur = integral + (size_t)(y + 1) * stride;
    const uint32_t* prev = integral + (size_t)y * stride;
    uint64_t* curq = sq_integral + (size_t)(y + 1) * stride;
    const uint64_t* prevq = sq_integral + (size_t)y * stride;
    cur[0] = 0;
    curq[0] = 0;
    for (int x = 0; x < w; ++x) {
      uint32_t v = src[x];
      row += v;
      sqrow += (uint64_t)v * v;
      cur[x + 1] = prev[x + 1] + row;
      curq[x + 1] = prevq[x + 1] + sqrow;
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

  int last_stage = n_stages - 1;
  int last_weak =
      c.stage_first_weak[last_stage] + c.stage_nweak[last_stage] - 1;
  int n_weak_total = last_weak + 1;
  // Nodes are laid out contiguously per weak (haar.py packer); the total
  // count is the last weak's first node + its tree size (walked — trees
  // are tiny). A pure-stump cascade has exactly one node per weak.
  int n_nodes = c.weak_first_node[last_weak];
  {
    int count = 0;
    std::vector<int> stack = {0};
    while (!stack.empty()) {
      int node = stack.back();
      stack.pop_back();
      ++count;
      int idx = c.weak_first_node[last_weak] + node;
      if (c.node_left[idx] > 0) stack.push_back(c.node_left[idx]);
      if (c.node_right[idx] > 0) stack.push_back(c.node_right[idx]);
    }
    n_nodes += count;
  }
  bool all_stumps = (n_nodes == n_weak_total);

#if defined(__AVX512F__)
  bool use_simd = all_stumps && (step == 1 || step == 2) &&
                  host_has_avx512() && !std::getenv("HAAR_FORCE_SCALAR");
#else
  const bool use_simd = false;
#endif

  const float inv_area = 1.0f / (float)(win_w * win_h);

  std::vector<Rect> found;
  std::vector<uint8_t> scaled;
  std::vector<uint32_t> integral;
  std::vector<uint64_t> sq_integral;
  std::vector<NodeT> nodes;
  std::vector<StumpW> stumps;

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
    // +32 slack: the 16-lane vector loads read up to 31 elements past a
    // lane-0 corner; at the last row's right edge that lands just past
    // the integral's end. The slack keeps those (masked-out) reads in
    // bounds.
    integral.resize((size_t)stride * (sh + 1) + 32);
    sq_integral.resize((size_t)stride * (sh + 1) + 32);
    compute_integrals(scaled.data(), sh, sw, integral.data(),
                      sq_integral.data());

    if (all_stumps)
      build_stump_table(c, n_weak_total, stride, stumps);
    else
      build_node_table(c, n_nodes, stride, nodes);
    // Window's own corner offsets (variance normalization).
    int wb = win_w, wc = win_h * stride, wd = win_h * stride + win_w;

    auto emit = [&](int x, int y) {
      found.push_back({(int)(x * scale + 0.5), (int)(y * scale + 0.5),
                       (int)(win_w * scale + 0.5),
                       (int)(win_h * scale + 0.5)});
    };

    int x_end = sw - win_w;  // inclusive last window x
    for (int y = 0; y + win_h <= sh; y += step) {
      const uint32_t* prow = integral.data() + (size_t)y * stride;
      const uint64_t* qrow = sq_integral.data() + (size_t)y * stride;
      int x = 0;
#if defined(__AVX512F__)
      if (use_simd) {
        const __m512i even_idx = even_index_vec();
        for (; x + 15 * step <= x_end; x += 16 * step) {
          uint16_t survivors =
              step == 1 ? eval_block_stump16<1>(c, stumps, prow + x,
                                                qrow + x, wb, wc, wd,
                                                inv_area, even_idx)
                        : eval_block_stump16<2>(c, stumps, prow + x,
                                                qrow + x, wb, wc, wd,
                                                inv_area, even_idx);
          while (survivors) {
            int k = __builtin_ctz(survivors);
            survivors &= (uint16_t)(survivors - 1);
            emit(x + k * step, y);
          }
        }
      }
#endif
      for (; x <= x_end; x += step) {
        float vn = window_var_norm(prow + x, qrow + x, wb, wc, wd, inv_area);
        bool hit = all_stumps
                       ? eval_window_stump(c, stumps, prow + x, vn, inv_area)
                       : eval_window_tree(c, nodes, prow + x, vn, inv_area);
        if (hit) emit(x, y);
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
