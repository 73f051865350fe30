// Native data-prep kernels for the training input pipeline.
//
// The reference feeds its trainer through torchvision transforms + a
// DataLoader worker pool (reference training/coach.py:198-219); here the
// per-batch hot path — uint8 -> [-1,1] float normalization and label-map
// nearest-resize + one-hot expansion — is a multithreaded C++ library loaded
// via ctypes (e4s2024_tpu/data/native.py), keeping the host side off the
// Python GIL while the TPU computes.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libfast_prep.so fast_prep.cpp -lpthread

#include <cstdint>
#include <functional>
#include <cstring>
#include <thread>
#include <vector>

namespace {

void normalize_range(const uint8_t* in, float* out, int64_t begin, int64_t end) {
    for (int64_t i = begin; i < end; ++i) {
        out[i] = static_cast<float>(in[i]) * (1.0f / 127.5f) - 1.0f;
    }
}

void run_parallel(int64_t total, int threads,
                  const std::function<void(int64_t, int64_t)>& fn) {
    if (threads <= 1 || total < (1 << 16)) {
        fn(0, total);
        return;
    }
    std::vector<std::thread> pool;
    int64_t chunk = (total + threads - 1) / threads;
    for (int t = 0; t < threads; ++t) {
        int64_t b = t * chunk;
        int64_t e = b + chunk < total ? b + chunk : total;
        if (b >= e) break;
        pool.emplace_back(fn, b, e);
    }
    for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// uint8 HWC images -> float32 in [-1, 1]. `n` = total element count.
void prep_images_pm1(const uint8_t* in, float* out, int64_t n, int threads) {
    run_parallel(n, threads, [&](int64_t b, int64_t e) {
        normalize_range(in, out, b, e);
    });
}

// (B, H, W) uint8 label maps -> (B, S, S, K) float32 one-hot with
// floor-nearest resize (torch F.interpolate 'nearest' semantics).
void labels_to_onehot(const uint8_t* labels, float* out, int b, int h, int w,
                      int s, int k, int threads) {
    const int64_t out_per_img = static_cast<int64_t>(s) * s * k;
    run_parallel(static_cast<int64_t>(b) * s, threads,
                 [&](int64_t begin, int64_t end) {
        for (int64_t row = begin; row < end; ++row) {
            int bi = static_cast<int>(row / s);
            int oy = static_cast<int>(row % s);
            int iy = static_cast<int>((static_cast<int64_t>(oy) * h) / s);
            const uint8_t* src = labels + (static_cast<int64_t>(bi) * h + iy) * w;
            float* dst = out + bi * out_per_img
                         + static_cast<int64_t>(oy) * s * k;
            std::memset(dst, 0, sizeof(float) * s * k);
            for (int ox = 0; ox < s; ++ox) {
                int ix = static_cast<int>((static_cast<int64_t>(ox) * w) / s);
                uint8_t cls = src[ix];
                if (cls < k) dst[static_cast<int64_t>(ox) * k + cls] = 1.0f;
            }
        }
    });
}

// horizontal flip of a (H, W, C) uint8 image in place into `out`
void hflip_u8(const uint8_t* in, uint8_t* out, int h, int w, int c) {
    for (int y = 0; y < h; ++y) {
        const uint8_t* src = in + static_cast<int64_t>(y) * w * c;
        uint8_t* dst = out + static_cast<int64_t>(y) * w * c;
        for (int x = 0; x < w; ++x) {
            std::memcpy(dst + static_cast<int64_t>(x) * c,
                        src + static_cast<int64_t>(w - 1 - x) * c, c);
        }
    }
}

}  // extern "C"
