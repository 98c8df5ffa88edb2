// FastBlend PatchMatch hot loops (native host backend).
//
// These mirror the semantics of the reference's three CUDA RawKernels
// (reference: diffsynth/extensions/FastBlend/cupy_kernels.py) but are a fresh
// CPU implementation: batch*rows are striped across std::threads, and the
// per-pixel patch loops are written against zero-padded (B, Hp, Wp, C)
// float32 images and (B, H, W, 2) int32 NNFs, exactly the layouts the numpy
// fallback in goal_force_tpu/extensions/fastblend.py uses.
//
// Build: g++ -O3 -march=native -shared -fPIC -pthread (see native/__init__.py).

#include <cstdint>
#include <thread>
#include <vector>
#include <algorithm>

namespace {

// Stripe [0, n) across hardware threads; f(begin, end) must be thread-safe
// on disjoint ranges.
template <typename F>
void parallel_for(int64_t n, F f) {
    unsigned hw = std::thread::hardware_concurrency();
    int64_t nthreads = std::max<int64_t>(1, std::min<int64_t>(hw ? hw : 1, n));
    if (nthreads == 1) { f((int64_t)0, n); return; }
    std::vector<std::thread> pool;
    int64_t chunk = (n + nthreads - 1) / nthreads;
    for (int64_t t = 0; t < nthreads; t++) {
        int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
        if (lo >= hi) break;
        pool.emplace_back([=] { f(lo, hi); });
    }
    for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// err(b, x, y) = sum over the full (patch x patch) window and channels of
// (tgt[b, x+p] - src[b, nnf(b,x,y)+p])^2, both images zero-padded by `pad`.
void gf_pm_patch_error(
    int B, int H, int W, int C, int patch, int pad,
    const float* src, const int32_t* nnf, const float* tgt, float* err) {
    const int r = patch / 2;
    const int64_t Wp = W + 2 * pad, Hp = H + 2 * pad;
    const int64_t img = Hp * Wp * C;
    parallel_for((int64_t)B * H, [=](int64_t lo, int64_t hi) {
        for (int64_t row = lo; row < hi; row++) {
            const int b = (int)(row / H), x = (int)(row % H);
            const float* srcb = src + (int64_t)b * img;
            const float* tgtb = tgt + (int64_t)b * img;
            const int32_t* nnfr = nnf + (((int64_t)b * H + x) * W) * 2;
            float* er = err + ((int64_t)b * H + x) * W;
            for (int y = 0; y < W; y++) {
                const int x_ = nnfr[2 * y], y_ = nnfr[2 * y + 1];
                float e = 0.f;
                for (int px = -r; px <= r; px++) {
                    const float* trow = tgtb + ((int64_t)(x + pad + px) * Wp
                                                + (y + pad - r)) * C;
                    const float* srow = srcb + ((int64_t)(x_ + pad + px) * Wp
                                                + (y_ + pad - r)) * C;
                    for (int64_t k = 0; k < (int64_t)(2 * r + 1) * C; k++) {
                        const float d = trow[k] - srow[k];
                        e += d * d;
                    }
                }
                er[y] = e;
            }
        }
    });
}

// Pairwise variant: patches of src_a at nnf_a vs patches of src_b at nnf_b
// (B here is the number of pairs; caller repeats the result on the batch axis).
void gf_pm_pairwise_error(
    int B, int H, int W, int C, int patch, int pad,
    const float* src_a, const int32_t* nnf_a,
    const float* src_b, const int32_t* nnf_b, float* err) {
    const int r = patch / 2;
    const int64_t Wp = W + 2 * pad, Hp = H + 2 * pad;
    const int64_t img = Hp * Wp * C;
    parallel_for((int64_t)B * H, [=](int64_t lo, int64_t hi) {
        for (int64_t row = lo; row < hi; row++) {
            const int b = (int)(row / H), x = (int)(row % H);
            const float* sa = src_a + (int64_t)b * img;
            const float* sb = src_b + (int64_t)b * img;
            const int32_t* na = nnf_a + (((int64_t)b * H + x) * W) * 2;
            const int32_t* nb = nnf_b + (((int64_t)b * H + x) * W) * 2;
            float* er = err + ((int64_t)b * H + x) * W;
            for (int y = 0; y < W; y++) {
                const int xa = na[2 * y], ya = na[2 * y + 1];
                const int xb = nb[2 * y], yb = nb[2 * y + 1];
                float e = 0.f;
                for (int px = -r; px <= r; px++) {
                    const float* ra = sa + ((int64_t)(xa + pad + px) * Wp
                                            + (ya + pad - r)) * C;
                    const float* rb = sb + ((int64_t)(xb + pad + px) * Wp
                                            + (yb + pad - r)) * C;
                    for (int64_t k = 0; k < (int64_t)(2 * r + 1) * C; k++) {
                        const float d = ra[k] - rb[k];
                        e += d * d;
                    }
                }
                er[y] = e;
            }
        }
    });
}

// out(b, x, y) = mean over in-bounds neighbour offsets p (and in-bounds voted
// coordinates nnf(x+p)-p) of src[b, nnf(b, x+p, y+p) - p]; `out` is UNPADDED
// (B, H, W, C). Offset (0,0) always votes, so the count is >= 1.
void gf_pm_remap(
    int B, int H, int W, int C, int patch, int pad,
    const float* src, const int32_t* nnf, float* out) {
    const int r = patch / 2;
    const int64_t Wp = W + 2 * pad, Hp = H + 2 * pad;
    const int64_t img = Hp * Wp * C;
    parallel_for((int64_t)B * H, [=](int64_t lo, int64_t hi) {
        std::vector<float> acc(C);
        for (int64_t row = lo; row < hi; row++) {
            const int b = (int)(row / H), x = (int)(row % H);
            const float* srcb = src + (int64_t)b * img;
            const int32_t* nnfb = nnf + ((int64_t)b * H * W) * 2;
            float* orow = out + (((int64_t)b * H + x) * W) * C;
            const int px0 = std::max(-r, -x), px1 = std::min(r, H - 1 - x);
            for (int y = 0; y < W; y++) {
                std::fill(acc.begin(), acc.end(), 0.f);
                int num = 0;
                const int py0 = std::max(-r, -y), py1 = std::min(r, W - 1 - y);
                for (int px = px0; px <= px1; px++) {
                    const int32_t* nrow = nnfb + (((int64_t)(x + px)) * W + y) * 2;
                    for (int py = py0; py <= py1; py++) {
                        const int cx = nrow[2 * py] - px;
                        const int cy = nrow[2 * py + 1] - py;
                        if (cx < 0 || cy < 0 || cx >= H || cy >= W) continue;
                        const float* v = srcb + ((int64_t)(cx + pad) * Wp
                                                 + (cy + pad)) * C;
                        for (int c = 0; c < C; c++) acc[c] += v[c];
                        num++;
                    }
                }
                const float inv = 1.0f / (num > 0 ? num : 1);
                for (int c = 0; c < C; c++) orow[y * C + c] = acc[c] * inv;
            }
        }
    });
}

}  // extern "C"
