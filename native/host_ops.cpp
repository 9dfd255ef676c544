// Native host-side image ops for the tpufusion data path.
//
// The reference's data pipeline rides torch's native C++ (DataLoader workers,
// torchvision Resize/Normalize kernels — `attack_main2.py:97-134`,
// `transforms_config.py`).  This library is the tpufusion equivalent: the
// host-side hot loops of decode->resize->normalize run in C (loaded via
// ctypes from tpufusion/data/native.py, with a numpy fallback), keeping the
// Python side orchestration-only so batches stream to the device without
// GIL-bound per-pixel work.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

extern "C" {

// uint8 HWC -> float32 HWC in [-1, 1]  (ToTensor + Normalize(.5,.5) fused)
void normalize_u8_to_pm1(const uint8_t* src, float* dst, int64_t n) {
    constexpr float k = 2.0f / 255.0f;
    for (int64_t i = 0; i < n; ++i) {
        dst[i] = static_cast<float>(src[i]) * k - 1.0f;
    }
}

// float32 [-1,1] -> uint8 (the tensor2im save path: (x+1)/2, clip, *255)
void pm1_to_u8(const float* src, uint8_t* dst, int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        float v = (src[i] + 1.0f) * 0.5f;
        v = v < 0.0f ? 0.0f : (v > 1.0f ? 1.0f : v);
        dst[i] = static_cast<uint8_t>(v * 255.0f + 0.5f);
    }
}

// Bilinear resize uint8 HWC -> float32 HWC in [-1,1], fused with normalize.
// Matches PIL/torchvision half-pixel convention (align_corners=False).
void resize_bilinear_u8_to_pm1(const uint8_t* src, int sh, int sw, int c,
                               float* dst, int dh, int dw) {
    const float sy = static_cast<float>(sh) / dh;
    const float sx = static_cast<float>(sw) / dw;
    constexpr float k = 2.0f / 255.0f;
    for (int y = 0; y < dh; ++y) {
        float fy = (y + 0.5f) * sy - 0.5f;
        int y0 = static_cast<int>(std::floor(fy));
        float wy = fy - y0;
        int y0c = std::clamp(y0, 0, sh - 1);
        int y1c = std::clamp(y0 + 1, 0, sh - 1);
        for (int x = 0; x < dw; ++x) {
            float fx = (x + 0.5f) * sx - 0.5f;
            int x0 = static_cast<int>(std::floor(fx));
            float wx = fx - x0;
            int x0c = std::clamp(x0, 0, sw - 1);
            int x1c = std::clamp(x0 + 1, 0, sw - 1);
            const uint8_t* p00 = src + (static_cast<int64_t>(y0c) * sw + x0c) * c;
            const uint8_t* p01 = src + (static_cast<int64_t>(y0c) * sw + x1c) * c;
            const uint8_t* p10 = src + (static_cast<int64_t>(y1c) * sw + x0c) * c;
            const uint8_t* p11 = src + (static_cast<int64_t>(y1c) * sw + x1c) * c;
            float* out = dst + (static_cast<int64_t>(y) * dw + x) * c;
            for (int ch = 0; ch < c; ++ch) {
                float top = p00[ch] + (p01[ch] - p00[ch]) * wx;
                float bot = p10[ch] + (p11[ch] - p10[ch]) * wx;
                out[ch] = (top + (bot - top) * wy) * k - 1.0f;
            }
        }
    }
}

// Average-pool float32 NHWC by an integer factor (the host-side analog of
// the device avg_pool used before encoder/VGG).
void avg_pool_pm1(const float* src, int n, int h, int w, int c, int factor,
                  float* dst) {
    const int oh = h / factor, ow = w / factor;
    const float inv = 1.0f / (factor * factor);
    for (int b = 0; b < n; ++b) {
        const float* sp = src + static_cast<int64_t>(b) * h * w * c;
        float* dp = dst + static_cast<int64_t>(b) * oh * ow * c;
        for (int y = 0; y < oh; ++y) {
            for (int x = 0; x < ow; ++x) {
                for (int ch = 0; ch < c; ++ch) {
                    float acc = 0.0f;
                    for (int dy = 0; dy < factor; ++dy) {
                        const float* row =
                            sp + ((static_cast<int64_t>(y) * factor + dy) * w +
                                  static_cast<int64_t>(x) * factor) * c + ch;
                        for (int dx = 0; dx < factor; ++dx) {
                            acc += row[static_cast<int64_t>(dx) * c];
                        }
                    }
                    dp[(static_cast<int64_t>(y) * ow + x) * c + ch] = acc * inv;
                }
            }
        }
    }
}

// Montage assembly: N HWC tiles -> one horizontal strip with padding
// (the vutils.save_image geometry; pad_value in [-1,1]).
void montage_strip_pm1(const float* src, int n, int h, int w, int c,
                       int padding, float pad_value, float* dst) {
    const int oh = h + 2 * padding;
    const int ow = n * (w + padding) + padding;
    const int64_t total = static_cast<int64_t>(oh) * ow * c;
    for (int64_t i = 0; i < total; ++i) dst[i] = pad_value;
    for (int t = 0; t < n; ++t) {
        const int x0 = padding + t * (w + padding);
        for (int y = 0; y < h; ++y) {
            const float* srow = src + ((static_cast<int64_t>(t) * h + y) * w) * c;
            float* drow = dst + ((static_cast<int64_t>(y + padding)) * ow + x0) * c;
            std::memcpy(drow, srow, static_cast<size_t>(w) * c * sizeof(float));
        }
    }
}

}  // extern "C"
