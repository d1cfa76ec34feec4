// Native host runtime: occupancy-grid preprocessing.
//
// The reference does its map ingest with OpenCV inside a Python node at
// startup (sim_node.py:255-315). Here the hot host-side raster work —
// bilinear resize, grayscale, threshold, obstacle ballooning — is C++
// (the framework's equivalent of the reference's native localization_pkg
// runtime), exposed to Python via a minimal C ABI loaded with ctypes.
// Falls back to the numpy implementation in sim/maps.py when unbuilt.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// RGB (h, w, 3) uint8 -> binary occupancy grid (size, size) float32
// {0 = blocked, 1 = free}, with obstacles dilated by `balloon` cells.
// Matches sim/maps.load_occ_map: bilinear resize, ITU-R 601 grayscale,
// threshold > 200, balloon.
void occgrid_from_rgb(const uint8_t* rgb, int h, int w, int size,
                      int balloon, float* out) {
  std::vector<float> gray(size * size);
  // bilinear resize + grayscale fused (align_corners=false convention,
  // matching PIL/cv2 resize)
  const float sy = static_cast<float>(h) / size;
  const float sx = static_cast<float>(w) / size;
  for (int i = 0; i < size; ++i) {
    float fy = (i + 0.5f) * sy - 0.5f;
    int y0 = std::max(0, std::min(h - 1, static_cast<int>(std::floor(fy))));
    int y1 = std::min(h - 1, y0 + 1);
    float wy = fy - std::floor(fy);
    if (fy < 0) { wy = 0.0f; }
    for (int j = 0; j < size; ++j) {
      float fx = (j + 0.5f) * sx - 0.5f;
      int x0 = std::max(0, std::min(w - 1, static_cast<int>(std::floor(fx))));
      int x1 = std::min(w - 1, x0 + 1);
      float wx = fx - std::floor(fx);
      if (fx < 0) { wx = 0.0f; }
      float acc = 0.0f;
      const float kr = 0.299f, kg = 0.587f, kb = 0.114f;
      auto px = [&](int y, int x) {
        const uint8_t* p = rgb + (y * w + x) * 3;
        return kr * p[0] + kg * p[1] + kb * p[2];
      };
      acc = (1 - wy) * ((1 - wx) * px(y0, x0) + wx * px(y0, x1)) +
            wy * ((1 - wx) * px(y1, x0) + wx * px(y1, x1));
      gray[i * size + j] = acc;
    }
  }
  // threshold > 200 => free
  std::vector<uint8_t> blocked(size * size);
  for (int i = 0; i < size * size; ++i) {
    blocked[i] = gray[i] > 200.0f ? 0 : 1;
    out[i] = blocked[i] ? 0.0f : 1.0f;
  }
  // balloon obstacles (sim_node.py:286-299): every cell within Chebyshev
  // distance `balloon` of a blocked cell becomes blocked.
  if (balloon > 0) {
    for (int i = 0; i < size; ++i) {
      for (int j = 0; j < size; ++j) {
        if (!blocked[i * size + j]) continue;
        int i0 = std::max(0, i - balloon), i1 = std::min(size - 1, i + balloon);
        int j0 = std::max(0, j - balloon), j1 = std::min(size - 1, j + balloon);
        for (int a = i0; a <= i1; ++a)
          for (int b = j0; b <= j1; ++b) out[a * size + b] = 0.0f;
      }
    }
  }
}

}  // extern "C"
