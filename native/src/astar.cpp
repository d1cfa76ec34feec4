// Native host runtime: reference-semantics A* + local-planner BFS.
//
// The interactive host loop (clicked goals, igvc host mode) plans on the CPU;
// this is the C++ fast path for planning/host.py's Python oracle, preserving
// the reference's exact expansion semantics (sorted-open-list A* with
// Chebyshev/squared-Euclidean heuristic, uniform step cost, collision-escape
// rule with +1000 priority penalty; astar.py:59-127) while running ~100x
// faster than the Python version. Exposed via a C ABI for ctypes.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

namespace {

struct Node {
  int ij;
  float g;
  float h;
  bool in_collision;
  int parent;
  float f() const { return g + h + (in_collision ? 1000.0f : 0.0f); }
};

}  // namespace

extern "C" {

// occ: (size*size) float {0=blocked, 1=free}. Returns path length (cells,
// excluding start) written into out_ij as (i, j) pairs start->goal, or -1 if
// no path / invalid start. max_out bounds the output length.
int astar_plan(const float* occ, int size, int si, int sj, int gi, int gj,
               int diagonals, int* out_ij, int max_out) {
  if (si < 0 || sj < 0 || si >= size || sj >= size) return -1;
  const int n = size * size;
  // stable priority: (f, insertion sequence) reproduces the reference's
  // stable sort-by-f + FIFO-within-ties ordering
  using QE = std::pair<float, std::pair<int64_t, int>>;  // (f, (seq, idx))
  std::priority_queue<QE, std::vector<QE>, std::greater<QE>> open;
  std::vector<Node> nodes;
  nodes.reserve(4096);
  std::vector<int> open_idx(n, -1);   // cell -> node idx while in open list
  std::vector<uint8_t> closed(n, 0);

  const int nbrs8[8][2] = {{0, -1}, {0, 1}, {-1, 0}, {1, 0},
                           {-1, -1}, {-1, 1}, {1, -1}, {1, 1}};
  const int n_nbrs = diagonals ? 8 : 4;
  int64_t seq = 0;

  const int start = si * size + sj;
  const int goal = gi * size + gj;
  nodes.push_back({start, 0.0f, 0.0f, occ[start] == 0.0f, -1});
  open.push({nodes[0].f(), {seq++, 0}});
  open_idx[start] = 0;

  auto heuristic = [&](int i, int j) -> float {
    if (diagonals)
      return static_cast<float>(std::max(std::abs(gi - i), std::abs(gj - j)));
    float di = static_cast<float>(gi - i), dj = static_cast<float>(gj - j);
    return di * di + dj * dj;
  };

  while (!open.empty()) {
    auto [f, si_pair] = open.top();
    open.pop();
    int idx = si_pair.second;
    Node cur = nodes[idx];
    if (open_idx[cur.ij] != idx) continue;  // stale entry (g was improved)
    if (f != cur.f()) {  // re-push with updated priority
      open.push({cur.f(), {seq++, idx}});
      continue;
    }
    open_idx[cur.ij] = -1;
    if (cur.ij == goal) {
      std::vector<int> rev;
      int c = idx;
      while (nodes[c].parent != -1) {
        rev.push_back(nodes[c].ij);
        c = nodes[c].parent;
      }
      int len = static_cast<int>(rev.size());
      if (len > max_out) return -2;
      for (int k = 0; k < len; ++k) {
        int cell = rev[len - 1 - k];
        out_ij[2 * k] = cell / size;
        out_ij[2 * k + 1] = cell % size;
      }
      return len;
    }
    closed[cur.ij] = 1;
    int ci = cur.ij / size, cj = cur.ij % size;
    for (int k = 0; k < n_nbrs; ++k) {
      int ni = ci + nbrs8[k][0], nj = cj + nbrs8[k][1];
      if (ni < 0 || nj < 0 || ni >= size || nj >= size) continue;
      int nij = ni * size + nj;
      bool coll = occ[nij] == 0.0f;
      if (coll && !cur.in_collision) continue;  // collision-escape rule
      if (closed[nij]) continue;
      float g_new = cur.g + 1.0f;
      if (open_idx[nij] != -1) {
        Node& ex = nodes[open_idx[nij]];
        if (g_new < ex.g) {
          ex.g = g_new;
          ex.parent = idx;
          open.push({ex.f(), {seq++, open_idx[nij]}});
        }
        continue;
      }
      Node nb{nij, g_new, heuristic(ni, nj), coll, idx};
      nodes.push_back(nb);
      open_idx[nij] = static_cast<int>(nodes.size()) - 1;
      open.push({nb.f(), {seq++, open_idx[nij]}});
    }
  }
  return -1;
}

// BFS to the nearest free cell from (si, sj), searching through blocked cells
// only (astar.py:27-56). Writes (i, j) into out_ij; returns 1 on success.
int local_planner_bfs(const float* occ, int size, int si, int sj,
                      int* out_ij) {
  si = std::max(0, std::min(si, size - 1));
  sj = std::max(0, std::min(sj, size - 1));
  if (occ[si * size + sj] == 1.0f) {
    out_ij[0] = si;
    out_ij[1] = sj;
    return 1;
  }
  std::vector<uint8_t> visited(size * size, 0);
  std::queue<int> q;
  q.push(si * size + sj);
  visited[si * size + sj] = 1;
  const int nbrs[4][2] = {{0, -1}, {0, 1}, {-1, 0}, {1, 0}};
  while (!q.empty()) {
    int cur = q.front();
    q.pop();
    int ci = cur / size, cj = cur % size;
    for (auto& d : nbrs) {
      int ni = ci + d[0], nj = cj + d[1];
      if (ni < 0 || nj < 0 || ni >= size || nj >= size) continue;
      int nij = ni * size + nj;
      if (occ[nij] == 1.0f) {
        out_ij[0] = ni;
        out_ij[1] = nj;
        return 1;
      }
      if (!visited[nij]) {
        visited[nij] = 1;
        q.push(nij);
      }
    }
  }
  return 0;
}

}  // extern "C"
