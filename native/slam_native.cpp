// slam_native: host-side native runtime components.
//
// The reference relies on PCL's kd-tree for corner/cloud NN queries
// (st10-chessCorner/src/src/detector.cpp:458-467) and runs its greedy
// chessboard growth as sequential C++ (detector.cpp:602-824). These are the
// parts of the framework that genuinely belong on the host CPU (pointer-
// chasing, branchy, tiny data): implemented here natively and exposed to
// Python via a C ABI consumed with ctypes (slam_tricks_tpu/native.py).
//
// Build: make -C native  (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// kd-tree (k = 2 or 3), median-split, heap-based knn
// ---------------------------------------------------------------------------
struct KDTree {
  int dim;
  int n;
  std::vector<float> pts;     // n * dim
  std::vector<int> idx;       // permutation, tree stored as nested median splits
  std::vector<int> left, right, axis;
  std::vector<int> node_pt;
  int root = -1;

  int build(std::vector<int>& ids, int lo, int hi, int depth) {
    if (lo >= hi) return -1;
    int ax = depth % dim;
    int mid = (lo + hi) / 2;
    std::nth_element(ids.begin() + lo, ids.begin() + mid, ids.begin() + hi,
                     [&](int a, int b) { return pts[a * dim + ax] < pts[b * dim + ax]; });
    int node = (int)node_pt.size();
    node_pt.push_back(ids[mid]);
    axis.push_back(ax);
    left.push_back(-1);
    right.push_back(-1);
    int l = build(ids, lo, mid, depth + 1);
    int r = build(ids, mid + 1, hi, depth + 1);
    left[node] = l;
    right[node] = r;
    return node;
  }

  void knn(const float* q, int k, int* out_idx, float* out_d2) const {
    // bounded max-heap of (d2, idx)
    std::vector<std::pair<float, int>> heap;
    heap.reserve(k + 1);
    search(root, q, k, heap);
    std::sort_heap(heap.begin(), heap.end());
    int m = (int)heap.size();
    for (int i = 0; i < k; i++) {
      out_idx[i] = i < m ? heap[i].second : -1;
      out_d2[i] = i < m ? heap[i].first : INFINITY;
    }
  }

  void search(int node, const float* q, int k,
              std::vector<std::pair<float, int>>& heap) const {
    if (node < 0) return;
    int p = node_pt[node];
    float d2 = 0;
    for (int a = 0; a < dim; a++) {
      float d = q[a] - pts[p * dim + a];
      d2 += d * d;
    }
    if ((int)heap.size() < k) {
      heap.emplace_back(d2, p);
      std::push_heap(heap.begin(), heap.end());
    } else if (d2 < heap.front().first) {
      std::pop_heap(heap.begin(), heap.end());
      heap.back() = {d2, p};
      std::push_heap(heap.begin(), heap.end());
    }
    int ax = axis[node];
    float diff = q[ax] - pts[p * dim + ax];
    int near = diff <= 0 ? left[node] : right[node];
    int far = diff <= 0 ? right[node] : left[node];
    search(near, q, k, heap);
    if ((int)heap.size() < k || diff * diff < heap.front().first)
      search(far, q, k, heap);
  }
};

}  // namespace

extern "C" {

void* kdtree_build(const float* pts, int n, int dim) {
  auto* t = new KDTree();
  t->dim = dim;
  t->n = n;
  t->pts.assign(pts, pts + (size_t)n * dim);
  std::vector<int> ids(n);
  std::iota(ids.begin(), ids.end(), 0);
  t->node_pt.reserve(n);
  t->axis.reserve(n);
  t->left.reserve(n);
  t->right.reserve(n);
  t->root = t->build(ids, 0, n, 0);
  return t;
}

void kdtree_free(void* handle) { delete static_cast<KDTree*>(handle); }

// queries: (m, dim); outputs: (m, k)
void kdtree_knn(void* handle, const float* queries, int m, int k,
                int* out_idx, float* out_d2) {
  auto* t = static_cast<KDTree*>(handle);
  for (int i = 0; i < m; i++)
    t->knn(queries + (size_t)i * t->dim, k, out_idx + (size_t)i * k,
           out_d2 + (size_t)i * k);
}

// ---------------------------------------------------------------------------
// Greedy chessboard growth (reference semantics: directional nearest search +
// monotone growth, detector.cpp:602-824). Corners: (n,2) float; scores (n,).
// Output: up to max_boards grids, flattened into out_grid with per-board
// (rows, cols) in out_shape; returns number of boards.
// ---------------------------------------------------------------------------
int grow_chessboards(const float* xy, const float* scores, int n,
                     float dist_factor, float cos_thresh, int max_boards,
                     int max_cells, int* out_grid, int* out_shape) {
  std::vector<char> used(n, 0);
  std::vector<int> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::sort(order.begin(), order.end(),
            [&](int a, int b) { return scores[a] > scores[b]; });

  auto vec = [&](int i, float* v) { v[0] = xy[2 * i]; v[1] = xy[2 * i + 1]; };

  auto nearest_in_dir = [&](int from, const float* dir, const std::vector<char>& ex,
                            float max_dist) -> int {
    float best = INFINITY;
    int bj = -1;
    for (int j = 0; j < n; j++) {
      if (ex[j] || j == from || !std::isfinite(scores[j])) continue;
      float dx = xy[2 * j] - xy[2 * from];
      float dy = xy[2 * j + 1] - xy[2 * from + 1];
      float d = std::sqrt(dx * dx + dy * dy) + 1e-9f;
      float c = (dx * dir[0] + dy * dir[1]) / d;
      if (c > cos_thresh && d < best && d < max_dist) {
        best = d;
        bj = j;
      }
    }
    return bj;
  };

  int n_boards = 0;
  int grid_off = 0;
  for (int oi = 0; oi < n && n_boards < max_boards; oi++) {
    int seed = order[oi];
    if (used[seed] || !std::isfinite(scores[seed])) continue;
    // two nearest neighbors define the local grid axes
    int nn1 = -1, nn2 = -1;
    float d1 = INFINITY, d2 = INFINITY;
    for (int j = 0; j < n; j++) {
      if (j == seed || !std::isfinite(scores[j])) continue;
      float dx = xy[2 * j] - xy[2 * seed];
      float dy = xy[2 * j + 1] - xy[2 * seed + 1];
      float d = dx * dx + dy * dy;
      if (d < d1) { d2 = d1; nn2 = nn1; d1 = d; nn1 = j; }
      else if (d < d2) { d2 = d; nn2 = j; }
    }
    if (nn1 < 0 || nn2 < 0) continue;
    float dirA[2] = {xy[2 * nn1] - xy[2 * seed], xy[2 * nn1 + 1] - xy[2 * seed + 1]};
    float la = std::sqrt(dirA[0] * dirA[0] + dirA[1] * dirA[1]);
    dirA[0] /= la; dirA[1] /= la;
    float dirB[2] = {xy[2 * nn2] - xy[2 * seed], xy[2 * nn2 + 1] - xy[2 * seed + 1]};
    float lb = std::sqrt(dirB[0] * dirB[0] + dirB[1] * dirB[1]);
    dirB[0] /= lb; dirB[1] /= lb;
    if (std::fabs(dirA[0] * dirB[0] + dirA[1] * dirB[1]) > 0.7f) continue;

    float step0 = la;
    auto walk = [&](int start, const float* dir, std::vector<int>& chain) {
      chain.clear();
      chain.push_back(start);
      float step = step0;
      std::vector<char> ex(used);
      while ((int)chain.size() < max_cells) {
        ex[chain.back()] = 1;
        int j = nearest_in_dir(chain.back(), dir, ex, dist_factor * step);
        if (j < 0) break;
        float dx = xy[2 * j] - xy[2 * chain.back()];
        float dy = xy[2 * j + 1] - xy[2 * chain.back() + 1];
        step = std::sqrt(dx * dx + dy * dy);
        chain.push_back(j);
      }
    };

    std::vector<int> fwd, back;
    walk(seed, dirA, fwd);
    float negA[2] = {-dirA[0], -dirA[1]};
    walk(seed, negA, back);
    std::vector<int> row(back.rbegin(), back.rend() - 1);
    row.insert(row.end(), fwd.begin(), fwd.end());
    if ((int)row.size() < 3) continue;

    std::vector<std::vector<int>> grid{row};
    for (int sgn = 0; sgn < 2; sgn++) {
      float dir[2] = {sgn ? -dirB[0] : dirB[0], sgn ? -dirB[1] : dirB[1]};
      std::vector<int> base = row;
      while (true) {
        std::vector<char> ex(used);
        for (auto& g : grid)
          for (int i : g) ex[i] = 1;
        std::vector<int> nxt;
        bool ok = true;
        for (int i : base) {
          int j = nearest_in_dir(i, dir, ex, dist_factor * step0 * 1.5f);
          if (j < 0) { ok = false; break; }
          nxt.push_back(j);
          ex[j] = 1;
        }
        if (!ok) break;
        if (sgn == 0) grid.push_back(nxt); else grid.insert(grid.begin(), nxt);
        base = nxt;
        if ((int)grid.size() >= max_cells) break;
      }
    }
    if ((int)grid.size() < 3) continue;
    int rows = (int)grid.size();
    int cols = (int)grid[0].size();
    if (grid_off + rows * cols > max_boards * max_cells * max_cells) break;
    for (auto& g : grid)
      for (int i : g) { used[i] = 1; out_grid[grid_off++] = i; }
    out_shape[2 * n_boards] = rows;
    out_shape[2 * n_boards + 1] = cols;
    n_boards++;
  }
  return n_boards;
}

}  // extern "C"
