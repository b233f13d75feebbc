/* Native host-side data-loader kernels.
 *
 * TPU-native counterpart of the reference's C++-backed loading path (the
 * reference leans on torch DataLoader's native workers + CUDA prefetcher;
 * our hot per-item work runs here instead): single-pass GT vote
 * regeneration (lib/joint/dataset.py:669-678 does a Python loop over
 * np.unique(instance_labels) with a full boolean mask per instance —
 * O(N * n_instances); this is O(N)).
 *
 * Built on demand with `cc -O3 -shared -fPIC`, loaded via ctypes
 * (no pybind11 in this environment).
 */

#include <stdint.h>
#include <string.h>

#define MAX_INSTANCES 4096

/* points: (n, stride) float32, xyz in the first 3 columns.
 * instance_labels: (n,) int64 in [0, MAX_INSTANCES).
 * semantic_ok: (n,) uint8 — 1 if the point's semantic label is in the
 *   detection set (precomputed by the caller).
 * votes_out: (n, 3) float32; mask_out: (n,) float32.
 *
 * Semantics: for every instance whose FIRST point (scan order) has
 * semantic_ok, each member point votes for the instance's AABB center
 * (0.5 * (min + max) over member xyz). Matches dataset.py:669-678 where
 * the semantic gate reads semantic_labels[ind[0]].
 */
void compute_votes(const float *points, int64_t stride, int64_t n,
                   const int64_t *instance_labels,
                   const uint8_t *semantic_ok, float *votes_out,
                   float *mask_out) {
  static const float FMAX = 3.4e38f;
  float mins[MAX_INSTANCES][3];
  float maxs[MAX_INSTANCES][3];
  uint8_t seen[MAX_INSTANCES];
  uint8_t ok[MAX_INSTANCES];
  memset(seen, 0, sizeof(seen));

  for (int64_t i = 0; i < n; ++i) {
    int64_t ins = instance_labels[i];
    if (ins < 0 || ins >= MAX_INSTANCES) continue;
    const float *p = points + i * stride;
    if (!seen[ins]) {
      seen[ins] = 1;
      ok[ins] = semantic_ok[i]; /* gate on the first member's semantics */
      for (int d = 0; d < 3; ++d) {
        mins[ins][d] = p[d];
        maxs[ins][d] = p[d];
      }
    } else {
      for (int d = 0; d < 3; ++d) {
        if (p[d] < mins[ins][d]) mins[ins][d] = p[d];
        if (p[d] > maxs[ins][d]) maxs[ins][d] = p[d];
      }
    }
  }

  for (int64_t i = 0; i < n; ++i) {
    int64_t ins = instance_labels[i];
    const float *p = points + i * stride;
    float *v = votes_out + i * 3;
    if (ins >= 0 && ins < MAX_INSTANCES && seen[ins] && ok[ins]) {
      for (int d = 0; d < 3; ++d) {
        v[d] = 0.5f * (mins[ins][d] + maxs[ins][d]) - p[d];
      }
      mask_out[i] = 1.0f;
    } else {
      v[0] = v[1] = v[2] = 0.0f;
      mask_out[i] = 0.0f;
    }
  }
  (void)FMAX;
}

/* Gather rows: out[i] = src[idx[i]] for (n_out, stride) float32 rows —
 * the point-subsampling gather (dataset.py:610-615). */
void gather_rows_f32(const float *src, int64_t stride, const int64_t *idx,
                     int64_t n_out, float *out) {
  for (int64_t i = 0; i < n_out; ++i) {
    memcpy(out + i * stride, src + idx[i] * stride,
           (size_t)stride * sizeof(float));
  }
}

void gather_rows_i64(const int64_t *src, const int64_t *idx, int64_t n_out,
                     int64_t *out) {
  for (int64_t i = 0; i < n_out; ++i) out[i] = src[idx[i]];
}
