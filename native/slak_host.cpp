// Host-side image pipeline kernels — the native data-path component of
// slak-tpu, playing the role torch's C++ DataLoader/vision kernels play in
// the reference training stack (SURVEY.md §2.1 "Dataset/transforms" row).
//
// The TPU never sees this code: it feeds the host->HBM pipeline. Heavy
// per-pixel work (crop + bicubic resample + flip + normalize, fused into a
// single pass producing the final float32 tensor) runs here instead of
// through PIL's multi-pass Image objects. Threading happens at the Python
// loader level (one image per pool thread), so these kernels are
// single-threaded and reentrant.
//
// Exposed via a plain C ABI for ctypes (no pybind11 dependency).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

namespace {

// Keys bicubic kernel, a = -0.5 (the convention PIL's BICUBIC uses).
inline float cubic(float x) {
    constexpr float a = -0.5f;
    x = std::fabs(x);
    if (x < 1.0f) return ((a + 2.0f) * x - (a + 3.0f)) * x * x + 1.0f;
    if (x < 2.0f) return (((x - 5.0f) * x + 8.0f) * x - 4.0f) * a;
    return 0.0f;
}

inline float clampf(float v, float lo, float hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

// Precomputed 1-D filter table: for each output position, a (start, count)
// window and normalized weights — computed once per resample like PIL's
// coefficient precompute, so the pixel loops are pure MACs the
// autovectorizer can chew on.
struct FilterTable {
    int* start;
    int* count;
    float* weights;  // [out][max_count]
    int max_count;

    FilterTable(int out_n, int src_lo, int src_hi, float scale,
                float origin) {
        const float support = std::max(scale, 1.0f) * 2.0f;
        const float inv_s = 1.0f / std::max(scale, 1.0f);
        max_count = static_cast<int>(support) * 2 + 2;
        start = new int[out_n];
        count = new int[out_n];
        weights = new float[static_cast<size_t>(out_n) * max_count]();
        for (int i = 0; i < out_n; ++i) {
            const float center = (i + 0.5f) * scale - 0.5f + origin;
            int lo = std::max(src_lo, static_cast<int>(
                std::floor(center - support + 0.5f)));
            int hi = std::min(src_hi, static_cast<int>(
                std::floor(center + support + 0.5f)));
            float wsum = 0.0f;
            float* w = weights + static_cast<size_t>(i) * max_count;
            for (int s = lo; s <= hi; ++s) {
                w[s - lo] = cubic((s - center) * inv_s);
                wsum += w[s - lo];
            }
            const float inv = wsum != 0.0f ? 1.0f / wsum : 0.0f;
            for (int k = 0; k <= hi - lo; ++k) w[k] *= inv;
            start[i] = lo;
            count[i] = hi - lo + 1;
        }
    }
    ~FilterTable() {
        delete[] start;
        delete[] count;
        delete[] weights;
    }
};

// Separable resample of one channel-interleaved RGB crop to (out_h, out_w).
void resample_rgb(const uint8_t* src, int src_h, int src_w,
                  int cx, int cy, int cw, int ch,
                  float* dst, int out_h, int out_w,
                  bool hflip, const float* mean, const float* stdv) {
    (void)src_h;
    const float scale_x = static_cast<float>(cw) / out_w;
    const float scale_y = static_cast<float>(ch) / out_h;
    FilterTable fx(out_w, cx, cx + cw - 1, scale_x, static_cast<float>(cx));
    FilterTable fy(out_h, 0, ch - 1, scale_y, 0.0f);

    // horizontal pass into a planar temp (3 x ch x out_w) for vectorization
    float* tmp = new float[3 * static_cast<size_t>(ch) * out_w];
    const size_t plane = static_cast<size_t>(ch) * out_w;
    for (int y = 0; y < ch; ++y) {
        const uint8_t* row = src + (static_cast<size_t>(cy + y) * src_w) * 3;
        float* t0 = tmp + static_cast<size_t>(y) * out_w;
        float* t1 = t0 + plane;
        float* t2 = t1 + plane;
        for (int x = 0; x < out_w; ++x) {
            const float* w = fx.weights
                + static_cast<size_t>(x) * fx.max_count;
            const uint8_t* px = row + static_cast<size_t>(fx.start[x]) * 3;
            float a0 = 0, a1 = 0, a2 = 0;
            const int n = fx.count[x];
            for (int k = 0; k < n; ++k) {
                a0 += w[k] * px[3 * k];
                a1 += w[k] * px[3 * k + 1];
                a2 += w[k] * px[3 * k + 2];
            }
            t0[x] = a0;
            t1[x] = a1;
            t2[x] = a2;
        }
    }

    // vertical pass: per output row, weighted sum of whole tmp rows
    // (contiguous, vectorizes), then interleave + flip + normalize
    float* rowbuf = new float[3 * static_cast<size_t>(out_w)];
    for (int y = 0; y < out_h; ++y) {
        const float* w = fy.weights + static_cast<size_t>(y) * fy.max_count;
        const int n = fy.count[y];
        const int s0 = fy.start[y];
        for (int c = 0; c < 3; ++c) {
            float* acc = rowbuf + static_cast<size_t>(c) * out_w;
            std::memset(acc, 0, sizeof(float) * out_w);
            for (int k = 0; k < n; ++k) {
                const float* trow = tmp + static_cast<size_t>(c) * plane
                    + static_cast<size_t>(s0 + k) * out_w;
                const float wk = w[k];
                for (int x = 0; x < out_w; ++x) acc[x] += wk * trow[x];
            }
        }
        float* out_row = dst + static_cast<size_t>(y) * out_w * 3;
        for (int x = 0; x < out_w; ++x) {
            const int ox = hflip ? (out_w - 1 - x) : x;
            for (int c = 0; c < 3; ++c) {
                const float v = clampf(rowbuf[c * out_w + x],
                                       0.0f, 255.0f) / 255.0f;
                out_row[ox * 3 + c] = (v - mean[c]) / stdv[c];
            }
        }
    }
    delete[] rowbuf;
    delete[] tmp;
}

}  // namespace

extern "C" {

// RandomResizedCrop + hflip + normalize, fused: uint8 HWC RGB -> float32
// (size, size, 3) normalized tensor.
void slak_rrc_normalize(const uint8_t* src, int src_h, int src_w,
                        int crop_x, int crop_y, int crop_w, int crop_h,
                        float* dst, int size, int hflip,
                        const float* mean, const float* stdv) {
    resample_rgb(src, src_h, src_w, crop_x, crop_y, crop_w, crop_h,
                 dst, size, size, hflip != 0, mean, stdv);
}

// Eval path: resize shorter side to scale_size, center-crop size^2,
// normalize — one pass (datasets.py:75-96 semantics).
void slak_center_crop_normalize(const uint8_t* src, int src_h, int src_w,
                                float* dst, int size, int scale_size,
                                const float* mean, const float* stdv) {
    int nw, nh;
    if (src_w <= src_h) {
        nw = scale_size;
        nh = static_cast<int>(std::lround(
            static_cast<double>(scale_size) * src_h / src_w));
    } else {
        nh = scale_size;
        nw = static_cast<int>(std::lround(
            static_cast<double>(scale_size) * src_w / src_h));
    }
    // crop box in source coordinates: the resize maps src->(nw,nh); the
    // centered size^2 crop of that maps back to a centered box in src
    const double sx = static_cast<double>(src_w) / nw;
    const double sy = static_cast<double>(src_h) / nh;
    const int left = static_cast<int>(((nw - size) / 2) * sx);
    const int top = static_cast<int>(((nh - size) / 2) * sy);
    const int cw = static_cast<int>(std::lround(size * sx));
    const int chh = static_cast<int>(std::lround(size * sy));
    resample_rgb(src, src_h, src_w, left, top,
                 std::min(cw, src_w - left), std::min(chh, src_h - top),
                 dst, size, size, false, mean, stdv);
}

int slak_host_version() { return 1; }

}  // extern "C"
