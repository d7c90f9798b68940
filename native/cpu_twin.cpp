// Native e2e CPU twin of the BASELINE north-star chain — an OpenMP C++
// implementation of decode → calibrate → star detect → match → warp →
// normalize → winsorized stack, used ONLY to measure an honest CPU
// baseline for bench.py's vs_native_e2e ratio (the reference siril-cli
// cannot be built here: no meson/cfitsio/glib).
//
// Semantics mirror the reference stages (cited per stage below) but the
// implementation deliberately takes the FASTER available algorithm at
// every step (subsampled background stats, moment centroids instead of
// Levenberg–Marquardt PSF fits, translation-only match, separable
// lanczos4 warp instead of a general remap): the measured rate is an
// UPPER bound on what the reference's own chain could reach on this
// host, which makes the reported TPU-vs-CPU ratio a LOWER bound.
//
// Every stage is embarrassingly frame- or row-parallel (the reference
// itself parallelizes identically: processing.c:204-207,
// median_and_mean.c:1384), so multicore throughput scale-models as
// rate × cores from a 1-core measurement.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC cpu_twin.cpp -o ...
// (driven by siril_tpu/native/__init__.py get_twin_lib()).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// subsampled median+MAD background stats (statistics.c FITS stats;
// subsampling is the "faster available algorithm" concession)
static void bg_stats(const float* img, int64_t h, int64_t w, int step,
                     float* med_out, float* mad_out) {
    std::vector<float> s;
    s.reserve((size_t)((h / step + 1) * (w / step + 1)));
    for (int64_t y = 0; y < h; y += step)
        for (int64_t x = 0; x < w; x += step) {
            float v = img[y * w + x];
            if (v != 0.0f) s.push_back(v);
        }
    if (s.empty()) { *med_out = 0; *mad_out = 0; return; }
    size_t m = s.size() / 2;
    std::nth_element(s.begin(), s.begin() + m, s.end());
    float med = s[m];
    for (auto& v : s) v = std::fabs(v - med);
    std::nth_element(s.begin(), s.begin() + m, s.end());
    *med_out = med;
    *mad_out = s[m];
}

struct Star { float x, y, flux; };

// peak find + 7x7 moment centroid (star_finder.c detection +
// a cheap centroid standing in for the PSF minimisation)
static void detect_stars(const float* img, int64_t h, int64_t w,
                         int max_stars, std::vector<Star>& out) {
    float med, mad;
    bg_stats(img, h, w, 4, &med, &mad);
    float thresh = med + 10.0f * 1.4826f * mad;
    std::vector<Star> cand;
    for (int64_t y = 4; y < h - 4; y++) {
        const float* r = img + y * w;
        for (int64_t x = 4; x < w - 4; x++) {
            float v = r[x];
            if (v <= thresh) continue;
            // 3x3 local max
            if (v < r[x - 1] || v < r[x + 1] ||
                v < r[x - w] || v < r[x + w] ||
                v < r[x - w - 1] || v < r[x - w + 1] ||
                v < r[x + w - 1] || v < r[x + w + 1]) continue;
            double sx = 0, sy = 0, sf = 0;
            for (int dy = -3; dy <= 3; dy++)
                for (int dx = -3; dx <= 3; dx++) {
                    float p = img[(y + dy) * w + x + dx] - med;
                    if (p > 0) { sf += p; sx += p * dx; sy += p * dy; }
                }
            if (sf <= 0) continue;
            cand.push_back({(float)(x + sx / sf), (float)(y + sy / sf),
                            (float)sf});
        }
    }
    std::sort(cand.begin(), cand.end(),
              [](const Star& a, const Star& b) { return a.flux > b.flux; });
    if ((int)cand.size() > max_stars) cand.resize(max_stars);
    out = std::move(cand);
}

// translation-only match: median of mutual-nearest deltas vs reference
// (the reference runs triangle match + RANSAC — strictly more work)
static void match_translation(const std::vector<Star>& ref,
                              const std::vector<Star>& fr,
                              float* dx_out, float* dy_out) {
    std::vector<float> dxs, dys;
    for (const auto& a : ref) {
        float best = 1e30f; const Star* bs = nullptr;
        for (const auto& b : fr) {
            float d = (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y);
            if (d < best) { best = d; bs = &b; }
        }
        if (bs && best < 100.0f) {          // within 10 px
            dxs.push_back(bs->x - a.x);
            dys.push_back(bs->y - a.y);
        }
    }
    if (dxs.empty()) { *dx_out = 0; *dy_out = 0; return; }
    size_t m = dxs.size() / 2;
    std::nth_element(dxs.begin(), dxs.begin() + m, dxs.end());
    std::nth_element(dys.begin(), dys.begin() + m, dys.end());
    *dx_out = dxs[m];
    *dy_out = dys[m];
}

static inline void lanczos4_weights(float t, float* wgt) {
    double sum = 0;
    for (int k = 0; k < 8; k++) {
        double x = t - (k - 3);
        double v;
        if (std::fabs(x) < 1e-7) v = 1.0;
        else if (std::fabs(x) >= 4.0) v = 0.0;
        else {
            double px = M_PI * x;
            v = 4.0 * std::sin(px) * std::sin(px / 4.0) / (px * px);
        }
        wgt[k] = (float)v; sum += v;
    }
    for (int k = 0; k < 8; k++) wgt[k] = (float)(wgt[k] / sum);
}

// separable lanczos4 pure-translation warp: out(x) = in(x - d)
// (the reference calls cv::warpAffine with WARP_INVERSE_MAP —
// a general remap, strictly more work per pixel)
static void warp_translation(const float* in, float* out, int64_t h,
                             int64_t w, float dx, float dy) {
    float sx = -dx, sy = -dy;
    int ix = (int)std::floor(sx), iy = (int)std::floor(sy);
    float wx[8], wy[8];
    lanczos4_weights(sx - ix, wx);
    lanczos4_weights(sy - iy, wy);
    std::vector<float> tmp((size_t)(h * w), 0.0f);   // y-filtered
#pragma omp parallel for schedule(static)
    for (int64_t y = 0; y < h; y++) {
        float* trow = tmp.data() + y * w;
        for (int k = 0; k < 8; k++) {
            int64_t ys = y + iy + k - 3;
            if (ys < 0 || ys >= h || wy[k] == 0.0f) continue;
            const float* srow = in + ys * w;
            float wk = wy[k];
            for (int64_t x = 0; x < w; x++) trow[x] += wk * srow[x];
        }
    }
#pragma omp parallel for schedule(static)
    for (int64_t y = 0; y < h; y++) {
        const float* trow = tmp.data() + y * w;
        float* orow = out + y * w;
        for (int64_t x = 0; x < w; x++) {
            float acc = 0;
            for (int k = 0; k < 8; k++) {
                int64_t xs = x + ix + k - 3;
                if (xs >= 0 && xs < w) acc += wx[k] * trow[xs];
            }
            orow[x] = acc;
        }
    }
}

}  // namespace

extern "C" {

// decode u16 (offset i16) → f32 [0,1] — the FITS fast path
void twin_decode_i16(const int16_t* raw, float* dst, int64_t n) {
    const float inv = 1.0f / 65535.0f;
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; i++)
        dst[i] = ((float)raw[i] + 32768.0f) * inv;
}

// Full chain over nframes resident [h*w] f32 frames (decoded raw in
// `frames`, modified in place).  Returns 0; per-stage seconds in
// stage_s[6]: calibrate, detect, match, warp, normalize, stack.
// preprocess.c:124 (calibrate), star_finder.c (detect), global.c:335
// + atpmatch (match), opencv.cpp (warp), normalization.c:146
// (normalize), median_and_mean.c:590-1103 (winsorized stack).
int twin_e2e(float* frames, int64_t nframes, int64_t h, int64_t w,
             const float* bias, const float* dark, const float* flat,
             float siglow, float sighigh, float* out, double* stage_s) {
    const int64_t p = h * w;
    auto now = []() {
#ifdef _OPENMP
        return omp_get_wtime();
#else
        return 0.0;
#endif
    };

    // 1. calibrate (in place)
    double t0 = now();
#pragma omp parallel for schedule(static)
    for (int64_t f = 0; f < nframes; f++) {
        float* fr = frames + f * p;
        for (int64_t i = 0; i < p; i++) {
            float fl = flat[i];
            float v = fr[i] - bias[i] - dark[i];
            fr[i] = fl != 0.0f ? v / fl : 0.0f;
        }
    }
    stage_s[0] = now() - t0;

    // 2. detect
    t0 = now();
    std::vector<std::vector<Star>> stars((size_t)nframes);
#pragma omp parallel for schedule(dynamic, 1)
    for (int64_t f = 0; f < nframes; f++)
        detect_stars(frames + f * p, h, w, 500, stars[f]);
    stage_s[1] = now() - t0;

    // 3. match (translation)
    t0 = now();
    std::vector<float> dx((size_t)nframes, 0), dy((size_t)nframes, 0);
#pragma omp parallel for schedule(dynamic, 1)
    for (int64_t f = 1; f < nframes; f++)
        match_translation(stars[0], stars[f], &dx[f], &dy[f]);
    stage_s[2] = now() - t0;

    // 4. warp (in place via per-frame temp)
    t0 = now();
    for (int64_t f = 1; f < nframes; f++) {
        std::vector<float> warped((size_t)p);
        warp_translation(frames + f * p, warped.data(), h, w, dx[f], dy[f]);
        std::memcpy(frames + f * p, warped.data(), (size_t)p * 4);
    }
    stage_s[3] = now() - t0;

    // 5. normalization estimators (lite: median + 1.5·MAD, subsampled)
    t0 = now();
    std::vector<float> scale((size_t)nframes, 1.0f),
        offset((size_t)nframes, 0.0f), loc((size_t)nframes),
        sca((size_t)nframes);
#pragma omp parallel for schedule(dynamic, 1)
    for (int64_t f = 0; f < nframes; f++) {
        float med, mad;
        bg_stats(frames + f * p, h, w, 2, &med, &mad);
        loc[f] = med; sca[f] = 1.5f * mad;
    }
    for (int64_t f = 0; f < nframes; f++) {
        scale[f] = sca[f] != 0.0f ? sca[0] / sca[f] : 1.0f;
        offset[f] = scale[f] * loc[f] - loc[0];
    }
    stage_s[4] = now() - t0;

    // 6. winsorized stack — same kernel as sirilio.cpp stack_winsorized
    t0 = now();
#pragma omp parallel
    {
        std::vector<float> v((size_t)nframes);
#pragma omp for schedule(static)
        for (int64_t px = 0; px < p; px++) {
            int64_t m = 0;
            for (int64_t f = 0; f < nframes; f++) {
                float x = frames[f * p + px];
                if (x != 0.0f) v[m++] = x * scale[f] - offset[f];
            }
            if (m == 0) { out[px] = 0.0f; continue; }
            if (m == 1) { out[px] = v[0]; continue; }
            std::sort(v.begin(), v.begin() + m);
            int64_t lo = 0, hi = m, r = 0;
            for (;;) {
                int64_t ww = hi - lo;
                float med = 0.5f * (v[lo + (ww - 1) / 2] + v[lo + ww / 2]);
                double s1 = 0, s2 = 0;
                for (int64_t i = lo; i < hi; i++) s1 += v[i];
                double mean = s1 / ww;
                for (int64_t i = lo; i < hi; i++) {
                    double d = v[i] - mean; s2 += d * d;
                }
                float sig = ww > 1 ? (float)std::sqrt(s2 / (ww - 1)) : 0.0f;
                float sig0 = sig + 1.0f;
                sig *= 1.134f;
                int it = 0;
                while (std::fabs(sig - sig0) > sig0 * 5e-4f && it++ < 50) {
                    sig0 = sig;
                    double t1 = 0;
                    float m0 = med - 1.5f * sig, m1 = med + 1.5f * sig;
                    for (int64_t i = lo; i < hi; i++) {
                        float x = v[i] < m0 ? m0 : (v[i] > m1 ? m1 : v[i]);
                        t1 += x;
                    }
                    double mn = t1 / ww;
                    double var = 0;
                    for (int64_t i = lo; i < hi; i++) {
                        float x = v[i] < m0 ? m0 : (v[i] > m1 ? m1 : v[i]);
                        double d = x - mn; var += d * d;
                    }
                    sig = 1.134f *
                          (float)std::sqrt(var / (ww > 1 ? ww - 1 : 1));
                }
                int64_t ncl = 0, nch = 0;
                for (int64_t i = lo; i < hi; i++) {
                    if (med - v[i] > sig * siglow) ncl++;
                    else break;
                }
                for (int64_t i = hi - 1; i >= lo; i--) {
                    if (v[i] - med > sig * sighigh) nch++;
                    else break;
                }
                int64_t max_acc = ww - r - 4; if (max_acc < 0) max_acc = 0;
                if (ncl > max_acc) ncl = max_acc;
                if (nch > max_acc - ncl) nch = max_acc - ncl;
                lo += ncl; hi -= nch; r += ncl + nch;
                if (ncl + nch == 0 || hi - lo <= 3) break;
            }
            double s = 0;
            for (int64_t i = lo; i < hi; i++) s += v[i];
            out[px] = hi > lo ? (float)(s / (hi - lo)) : 0.0f;
        }
    }
    stage_s[5] = now() - t0;
    return 0;
}

int twin_threads(void) {
#ifdef _OPENMP
    return omp_get_max_threads();
#else
    return 1;
#endif
}

}  // extern "C"
