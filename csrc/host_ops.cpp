// Native host-side data-pipeline kernels for rpeflow_tpu.
//
// The reference keeps its native code on the device side (CUDA kernels under
// models/csrc); on TPU the device kernels are Pallas/XLA, so the native layer
// moves to where this framework is actually bottlenecked: the host data
// pipeline. numpy's np.add.at scatter is notoriously slow (no vectorized
// fast path); these kernels replace the hot scatter loops of the event
// voxelizers (reference event_utils.py:211-261 and dsec.py:536-573).
//
// Build: see csrc/build.sh (plain g++, no external deps). Loaded via ctypes
// from rpeflow_tpu/data/native.py; the numpy implementations remain the
// reference semantics and the fallback.

#include <cstdint>
#include <cstring>

extern "C" {

// voxel grid [num_bins, height, width]; one triangle-weighted scatter pass.
// Entries with ti outside [0, num_bins) are skipped (matches the numpy
// valid-mask behaviour).
void event_scatter_add(float* vox, int64_t n_events, const int32_t* xs,
                       const int32_t* ys, const int32_t* tis,
                       const float* weights, int32_t num_bins, int32_t height,
                       int32_t width) {
  const int64_t hw = static_cast<int64_t>(height) * width;
  for (int64_t i = 0; i < n_events; ++i) {
    const int32_t t = tis[i];
    if (t < 0 || t >= num_bins) continue;
    const int64_t idx = t * hw + static_cast<int64_t>(ys[i]) * width + xs[i];
    vox[idx] += weights[i];
  }
}

// Trilinear (x, y, t) scatter used by the DSEC voxelizer variant
// (reference dsec.py:536-573): each event spreads over its 8 surrounding
// cells with signed value 2p-1 (the caller pre-computes `values`).
void event_scatter_trilinear(float* vox, int64_t n_events, const float* xs,
                             const float* ys, const float* ts,
                             const float* values, int32_t num_bins,
                             int32_t height, int32_t width) {
  const int64_t hw = static_cast<int64_t>(height) * width;
  for (int64_t i = 0; i < n_events; ++i) {
    const float x = xs[i], y = ys[i], t = ts[i];
    const int32_t x0 = static_cast<int32_t>(x);
    const int32_t y0 = static_cast<int32_t>(y);
    const int32_t t0 = static_cast<int32_t>(t);
    const float v = values[i];
    for (int32_t dt = 0; dt < 2; ++dt) {
      const int32_t tl = t0 + dt;
      if (tl < 0 || tl >= num_bins) continue;
      const float wt = 1.0f - (tl > t ? tl - t : t - tl);
      if (wt <= 0.0f) continue;
      for (int32_t dy = 0; dy < 2; ++dy) {
        const int32_t yl = y0 + dy;
        if (yl < 0 || yl >= height) continue;
        const float wy = 1.0f - (yl > y ? yl - y : y - yl);
        for (int32_t dx = 0; dx < 2; ++dx) {
          const int32_t xl = x0 + dx;
          if (xl < 0 || xl >= width) continue;
          const float wx = 1.0f - (xl > x ? xl - x : x - xl);
          vox[tl * hw + static_cast<int64_t>(yl) * width + xl] += v * wx * wy * wt;
        }
      }
    }
  }
}

// Inverse-distance-weighted bilinear backward warp used by the Kubric/DSEC
// raw pipelines (reference utils.py:624-678, bilinear branch).
void flow_warp_bilinear(float* out, const float* img, const float* flow,
                        int32_t height, int32_t width, int32_t channels,
                        float filling_value) {
  const double eps = 1e-6;
  for (int64_t i = 0; i < static_cast<int64_t>(height) * width * channels; ++i)
    out[i] = filling_value;
  for (int32_t r = 0; r < height; ++r) {
    for (int32_t c = 0; c < width; ++c) {
      const int64_t p = (static_cast<int64_t>(r) * width + c);
      const double dx = r + flow[p * 2 + 1] + eps;  // row coordinate
      const double dy = c + flow[p * 2 + 0] + eps;  // col coordinate
      const int32_t sx = static_cast<int32_t>(dx >= 0 ? dx : dx - 1);
      const int32_t sy = static_cast<int32_t>(dy >= 0 ? dy : dy - 1);
      if (sx < 0 || sx >= height - 1 || sy < 0 || sy >= width - 1) continue;
      const double fx = dx - sx, fy = dy - sy;
      const int64_t p00 = (static_cast<int64_t>(sx) * width + sy) * channels;
      const int64_t p10 = (static_cast<int64_t>(sx + 1) * width + sy) * channels;
      for (int32_t ch = 0; ch < channels; ++ch) {
        out[p * channels + ch] = static_cast<float>(
            img[p00 + ch] * (1 - fx) * (1 - fy) +
            img[p10 + ch] * fx * (1 - fy) +
            img[p00 + channels + ch] * (1 - fx) * fy +
            img[p10 + channels + ch] * fx * fy);
      }
    }
  }
}

}  // extern "C"
