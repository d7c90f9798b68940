// sirilio — native I/O kernels for siril_tpu.
//
// TPU-native equivalent of the reference's cfitsio hot paths
// (src/io/image_format_fits.c type conversion loops) and the stacking
// block assembly (median_and_mean.c stack_read_block_data:382): the
// Python/numpy path spends its time in big-endian u16 → f32 conversion
// and row-flip copies; these OpenMP loops saturate memory bandwidth
// instead.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC (see
// siril_tpu/native/__init__.py, which compiles on demand and caches the
// .so). Exposed via ctypes — no pybind11 dependency.

#include <cstdint>
#include <cstring>
#include <cstdio>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Decode big-endian int16 FITS data (BZERO offset) to float32 in [0,1].
// src: raw bytes (n values); dst: n floats.
// flip_rows: if h>0, vertically flip (FITS bottom-up → top-down).
void decode_i16_be(const uint8_t* src, float* dst, int64_t w, int64_t h,
                   double bzero, double bscale, int flip_rows) {
    const float inv = 1.0f / 65535.0f;
    const float fz = (float)bzero;
    const float fs = (float)bscale;
#pragma omp parallel for schedule(static)
    for (int64_t y = 0; y < h; y++) {
        const uint8_t* srow = src + 2 * y * w;
        float* drow = dst + (flip_rows ? (h - 1 - y) : y) * w;
        for (int64_t x = 0; x < w; x++) {
            int16_t v = (int16_t)((srow[2 * x] << 8) | srow[2 * x + 1]);
            drow[x] = ((float)v * fs + fz) * inv;
        }
    }
}

// Decode big-endian float32 FITS data, optional row flip.
void decode_f32_be(const uint8_t* src, float* dst, int64_t w, int64_t h,
                   int flip_rows) {
#pragma omp parallel for schedule(static)
    for (int64_t y = 0; y < h; y++) {
        const uint8_t* srow = src + 4 * y * w;
        float* drow = dst + (flip_rows ? (h - 1 - y) : y) * w;
        for (int64_t x = 0; x < w; x++) {
            uint32_t b = ((uint32_t)srow[4 * x] << 24) |
                         ((uint32_t)srow[4 * x + 1] << 16) |
                         ((uint32_t)srow[4 * x + 2] << 8) |
                         ((uint32_t)srow[4 * x + 3]);
            float f;
            memcpy(&f, &b, 4);
            drow[x] = f;
        }
    }
}

// Decode little-endian u16 (SER) to float32 [0,1].
void decode_u16_le(const uint8_t* src, float* dst, int64_t n,
                   double maxval) {
    const float inv = (float)(1.0 / maxval);
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; i++) {
        uint16_t v = (uint16_t)(src[2 * i] | (src[2 * i + 1] << 8));
        dst[i] = (float)v * inv;
    }
}

// Stacking block assembly: decode rows [y0,y1) of N frames' raw i16-BE
// planes directly into the (N, rows*w) stack buffer, applying per-frame
// integer x/y shifts with zero fill (median_and_mean.c:1613-1637).
// srcs: array of N pointers to each frame's FULL-PLANE raw data
//       (big-endian i16, bottom-up rows, h rows of w).
void assemble_block_i16(const uint8_t** srcs, float* dst, int64_t nframes,
                        int64_t w, int64_t h, int64_t y0, int64_t y1,
                        const int32_t* dx, const int32_t* dy,
                        double bzero, double bscale) {
    const float inv = 1.0f / 65535.0f;
    const float fz = (float)bzero;
    const float fs = (float)bscale;
    const int64_t rows = y1 - y0;
#pragma omp parallel for schedule(dynamic, 1)
    for (int64_t f = 0; f < nframes; f++) {
        float* out = dst + f * rows * w;
        const uint8_t* src = srcs[f];
        for (int64_t y = y0; y < y1; y++) {
            float* drow = out + (y - y0) * w;
            const int64_t sy = y - dy[f];          // reg(x,y)=frame(x-dx,y-dy)
            if (sy < 0 || sy >= h) {
                memset(drow, 0, w * sizeof(float));
                continue;
            }
            // FITS bottom-up: image row sy is stored at h-1-sy
            const uint8_t* srow = src + 2 * (h - 1 - sy) * w;
            const int64_t d = dx[f];
            int64_t xa = d > 0 ? d : 0;            // valid out range
            int64_t xb = w + (d < 0 ? d : 0);
            for (int64_t x = 0; x < xa; x++) drow[x] = 0.0f;
            for (int64_t x = xb > 0 ? xb : 0; x < w; x++) drow[x] = 0.0f;
            for (int64_t x = xa; x < xb; x++) {
                const int64_t sx = x - d;
                int16_t v = (int16_t)((srow[2 * sx] << 8) | srow[2 * sx + 1]);
                drow[x] = ((float)v * fs + fz) * inv;
            }
        }
    }
}

int sirilio_version(void) { return 1; }

int sirilio_threads(void) {
#ifdef _OPENMP
    return omp_get_max_threads();
#else
    return 1;
#endif
}

}  // extern "C"
