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

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <vector>

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

// Winsorized sigma-clip rejection + mean over an (N, P) stack — the
// CPU-baseline twin of the reference's hottest loop (mean_and_reject,
// median_and_mean.c:956 + rejection_float.c:222-257).  Used by
// scripts/measure_cpu_baseline.py to give bench.py an HONEST strongest-
// available-CPU number (the reference itself cannot be built in this
// environment: no meson/cfitsio/glib).  Same semantics as the JAX path:
// sort ascending (zeros removed), iterate winsorized-sigma clipping on
// the contiguous kept window, mean of survivors.
void stack_winsorized(const float* stack, int64_t n, int64_t p,
                      const float* scale, const float* offset,
                      float siglow, float sighigh, float* out) {
#pragma omp parallel
    {
        std::vector<float> v((size_t)n);
#pragma omp for schedule(static)
        for (int64_t px = 0; px < p; px++) {
            int64_t m = 0;
            for (int64_t f = 0; f < n; f++) {
                float x = stack[f * p + px];
                if (x != 0.0f) v[m++] = x * scale[f] - offset[f];
            }
            if (m == 0) { out[px] = 0.0f; continue; }
            if (m == 1) { out[px] = v[0]; continue; }
            std::sort(v.begin(), v.begin() + m);
            int64_t lo = 0, hi = m, r = 0;
            for (;;) {
                // median of window
                int64_t w = hi - lo;
                float med = 0.5f * (v[lo + (w - 1) / 2] + v[lo + w / 2]);
                // winsorized sigma
                double s1 = 0, s2 = 0;
                for (int64_t i = lo; i < hi; i++) { s1 += v[i]; }
                double mean = s1 / w;
                for (int64_t i = lo; i < hi; i++) {
                    double d = v[i] - mean; s2 += d * d;
                }
                float sig = w > 1 ? (float)sqrt(s2 / (w - 1)) : 0.0f;
                float sig0 = sig + 1.0f;
                sig *= 1.134f;
                int it = 0;
                while (fabsf(sig - sig0) > sig0 * 5e-4f && it++ < 50) {
                    sig0 = sig;
                    double t1 = 0;
                    float m0 = med - 1.5f * sig, m1 = med + 1.5f * sig;
                    for (int64_t i = lo; i < hi; i++) {
                        float x = v[i] < m0 ? m0 : (v[i] > m1 ? m1 : v[i]);
                        t1 += x;
                    }
                    double mn = t1 / w;
                    double var = 0;
                    for (int64_t i = lo; i < hi; i++) {
                        float x = v[i] < m0 ? m0 : (v[i] > m1 ? m1 : v[i]);
                        double d = x - mn; var += d * d;
                    }
                    sig = 1.134f * (float)sqrt(var / (w > 1 ? w - 1 : 1));
                }
                // clip window with cumulative N-r<=4 guard
                int64_t ncl = 0, nch = 0;
                for (int64_t i = lo; i < hi; i++) {
                    if (med - v[i] > sig * siglow) ncl++;
                    else break;
                }
                for (int64_t i = hi - 1; i >= lo; i--) {
                    if (v[i] - med > sig * sighigh) nch++;
                    else break;
                }
                int64_t max_acc = w - r - 4; if (max_acc < 0) max_acc = 0;
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

// ---------------------------------------------------------------------------
// RICE_1 tile codec (FITS Tiled Image Compression convention).
// Equivalent role to cfitsio's Rice coder used by the reference's
// compressed-FITS support (image_format_fits.c) — fresh implementation
// from the published algorithm, OpenMP-parallel over tiles.
// ---------------------------------------------------------------------------

namespace {

struct BitWriter {
    uint8_t* out;
    int64_t cap, len;
    uint64_t acc;
    int nbits;
    BitWriter(uint8_t* o, int64_t c) : out(o), cap(c), len(0), acc(0), nbits(0) {}
    inline void put(uint64_t v, int n) {
        acc = (acc << n) | (v & ((1ULL << n) - 1));
        nbits += n;
        while (nbits >= 8) {
            nbits -= 8;
            if (len < cap) out[len] = (uint8_t)(acc >> nbits);
            len++;
        }
        acc &= (1ULL << nbits) - 1;
    }
    inline void unary(int64_t zeros) {
        while (zeros >= 31) { put(0, 31); zeros -= 31; }
        put(1, (int)zeros + 1);
    }
    int64_t flush() {
        if (nbits) {
            if (len < cap) out[len] = (uint8_t)(acc << (8 - nbits));
            len++;
            acc = 0; nbits = 0;
        }
        return len;
    }
};

struct BitReader {
    const uint8_t* in;
    int64_t len, pos;
    uint64_t acc;
    int nbits;
    BitReader(const uint8_t* i, int64_t l) : in(i), len(l), pos(0), acc(0), nbits(0) {}
    inline uint64_t get(int n) {
        while (nbits < n) {
            uint8_t b = pos < len ? in[pos] : 0;
            pos++;
            acc = (acc << 8) | b;
            nbits += 8;
        }
        nbits -= n;
        uint64_t v = (acc >> nbits) & ((1ULL << n) - 1);
        acc &= (1ULL << nbits) - 1;
        return v;
    }
    inline int64_t unary() {
        int64_t n = 0;
        while (get(1) == 0) n++;
        return n;
    }
};

inline void fs_params(int bytepix, int* fsbits, int* fsmax) {
    if (bytepix == 1) { *fsbits = 3; *fsmax = 6; }
    else if (bytepix == 2) { *fsbits = 4; *fsmax = 14; }
    else { *fsbits = 5; *fsmax = 25; }
}

} // namespace

extern "C" {

// Encode one tile of npix values (given as int64) with block size 32.
// dst must have capacity cap bytes; returns encoded length (may exceed
// cap — caller must retry with a larger buffer; never writes past cap).
int64_t rice_encode_tile(const int64_t* a, int64_t npix, int bytepix,
                         uint8_t* dst, int64_t cap) {
    if (npix <= 0) return 0;
    int fsbits, fsmax;
    fs_params(bytepix, &fsbits, &fsmax);
    const int bbits = bytepix * 8;
    const int64_t half = 1LL << (bbits - 1);
    const int64_t full = 1LL << bbits;
    BitWriter w(dst, cap);
    w.put((uint64_t)a[0] & (full - 1), bbits);
    const int NB = 32;
    for (int64_t start = 1; start < npix; start += NB) {
        int64_t end = start + NB < npix ? start + NB : npix;
        int n = (int)(end - start);
        uint64_t u[32];
        uint64_t sum = 0;
        for (int j = 0; j < n; j++) {
            int64_t d = a[start + j] - a[start + j - 1];
            d = ((d + half) % full + full) % full - half;   // wrap to bbits
            uint64_t m = d < 0 ? ~((uint64_t)d << 1) : ((uint64_t)d << 1);
            m &= (uint64_t)(full - 1);
            u[j] = m;
            sum += m;
        }
        if (sum == 0) { w.put(0, fsbits); continue; }
        double dpsum = ((double)sum - (n / 2) - 1) / n;
        uint64_t psum = dpsum > 0 ? ((uint64_t)dpsum) >> 1 : 0;
        int fs = 0;
        while (psum > 0) { psum >>= 1; fs++; }
        if (fs >= fsmax) {
            w.put((uint64_t)fsmax + 1, fsbits);
            for (int j = 0; j < n; j++) w.put(u[j], bbits);
        } else {
            w.put((uint64_t)fs + 1, fsbits);
            for (int j = 0; j < n; j++) {
                w.unary((int64_t)(u[j] >> fs));
                if (fs) w.put(u[j], fs);
            }
        }
    }
    return w.flush();
}

// Decode npix values into out (int64).
void rice_decode_tile(const uint8_t* src, int64_t nbytes, int64_t npix,
                      int bytepix, int64_t* out) {
    if (npix <= 0) return;
    int fsbits, fsmax;
    fs_params(bytepix, &fsbits, &fsmax);
    const int bbits = bytepix * 8;
    const int64_t half = 1LL << (bbits - 1);
    const int64_t full = 1LL << bbits;
    BitReader r(src, nbytes);
    int64_t last = (int64_t)r.get(bbits);
    if (last >= half) last -= full;
    out[0] = last;
    int64_t i = 1;
    const int NB = 32;
    while (i < npix) {
        int n = (int)(npix - i < NB ? npix - i : NB);
        uint64_t code = r.get(fsbits);
        for (int j = 0; j < n; j++) {
            uint64_t m;
            if (code == 0) m = 0;
            else if (code == (uint64_t)fsmax + 1) m = r.get(bbits);
            else {
                int fs = (int)code - 1;
                uint64_t top = (uint64_t)r.unary();
                m = (top << fs) | (fs ? r.get(fs) : 0);
            }
            int64_t d = (m & 1) ? ~(int64_t)(m >> 1) : (int64_t)(m >> 1);
            last = ((last + d + half) % full + full) % full - half;
            out[i + j] = last;
        }
        i += n;
    }
}

// Batch: encode `ntiles` row tiles of `tile_pix` i16 values each.
// offsets/lengths are outputs; heap receives concatenated streams.
// Returns total heap bytes, or -1 if heap_cap insufficient.
int64_t rice_encode_tiles_i16(const int16_t* data, int64_t ntiles,
                              int64_t tile_pix, uint8_t* heap,
                              int64_t heap_cap, int64_t* offsets,
                              int64_t* lengths) {
    // worst case per tile: bbits+fsbits per pixel / 8 + slack
    int64_t worst = tile_pix * 3 + 64;
    // encode in parallel into per-tile scratch, then compact
    std::vector<std::vector<uint8_t>>* scratch =
        new std::vector<std::vector<uint8_t>>(ntiles);
#pragma omp parallel for schedule(static)
    for (int64_t t = 0; t < ntiles; t++) {
        std::vector<int64_t> vals(tile_pix);
        for (int64_t k = 0; k < tile_pix; k++)
            vals[k] = data[t * tile_pix + k];
        (*scratch)[t].resize(worst);
        int64_t n = rice_encode_tile(vals.data(), tile_pix, 2,
                                     (*scratch)[t].data(), worst);
        (*scratch)[t].resize(n <= worst ? n : 0);
        lengths[t] = n <= worst ? n : 0;
    }
    int64_t off = 0;
    for (int64_t t = 0; t < ntiles; t++) {
        offsets[t] = off;
        if (off + lengths[t] > heap_cap) { delete scratch; return -1; }
        memcpy(heap + off, (*scratch)[t].data(), lengths[t]);
        off += lengths[t];
    }
    delete scratch;
    return off;
}

// Batch decode of i16 row tiles back into an int16 buffer.
void rice_decode_tiles_i16(const uint8_t* heap, const int64_t* offsets,
                           const int64_t* lengths, int64_t ntiles,
                           int64_t tile_pix, int16_t* out) {
#pragma omp parallel for schedule(static)
    for (int64_t t = 0; t < ntiles; t++) {
        std::vector<int64_t> vals(tile_pix);
        rice_decode_tile(heap + offsets[t], lengths[t], tile_pix, 2,
                         vals.data());
        for (int64_t k = 0; k < tile_pix; k++)
            out[t * tile_pix + k] = (int16_t)vals[k];
    }
}

} // extern "C"

// ===========================================================================
// Lossless JPEG (ITU-T.81 process 14, SOF3) decoder — the DNG/raw tile
// codec (reference reaches it through libraw; this is an original
// implementation of the published spec: Huffman difference categories,
// predictors P1..P7, point transform, restart markers, FF00 stuffing).
// ===========================================================================

namespace ljpeg {

struct BitReader {
    const uint8_t* d;
    int64_t n, pos;
    uint32_t acc;
    int bits;
    BitReader(const uint8_t* d_, int64_t n_)
        : d(d_), n(n_), pos(0), acc(0), bits(0) {}
    int get1() {
        if (bits == 0) {
            uint8_t b = 0xFF;
            if (pos < n) {
                b = d[pos++];
                if (b == 0xFF) {
                    if (pos < n && d[pos] == 0x00) pos++;  // stuffed FF
                    // a real marker mid-scan: feed 1-bits (decoder will
                    // finish the current row; callers bound by size)
                }
            }
            acc = b;
            bits = 8;
        }
        bits--;
        return (acc >> bits) & 1;
    }
    int get(int nb) {
        int v = 0;
        for (int i = 0; i < nb; i++) v = (v << 1) | get1();
        return v;
    }
    void restart_align() {       // skip to just after the next RSTn
        acc = 0; bits = 0;
        while (pos + 1 < n) {
            if (d[pos] == 0xFF && d[pos + 1] >= 0xD0 && d[pos + 1] <= 0xD7) {
                pos += 2;
                return;
            }
            pos++;
        }
    }
};

struct Huff {
    int mincode[17], maxcode[17], valptr[17];
    uint8_t vals[256];
    bool ok = false;
    void build(const uint8_t* counts, const uint8_t* symbols, int total) {
        for (int i = 0; i < total && i < 256; i++) vals[i] = symbols[i];
        int code = 0, k = 0;
        for (int l = 1; l <= 16; l++) {
            valptr[l] = k;
            mincode[l] = code;
            k += counts[l - 1];
            code += counts[l - 1];
            maxcode[l] = counts[l - 1] ? code - 1 : -1;
            code <<= 1;
        }
        ok = true;
    }
    int decode(BitReader& br) const {
        int code = 0;
        for (int l = 1; l <= 16; l++) {
            code = (code << 1) | br.get1();
            if (maxcode[l] >= 0 && code <= maxcode[l])
                return vals[valptr[l] + code - mincode[l]];
        }
        return -1;
    }
};

static inline int extend(int v, int t) {
    if (t == 0) return 0;
    if (t == 16) return 32768;               // ssss=16: no extra bits
    return (v < (1 << (t - 1))) ? v - (1 << t) + 1 : v;
}

}  // namespace ljpeg

// Decode a lossless JPEG stream.  out: row-major interleaved
// (height × width·ncomp) uint16.  Returns 0 on success, negative error.
extern "C" int decode_ljpeg(const uint8_t* buf, int64_t len,
                            uint16_t* out, int64_t out_cap,
                            int32_t* out_w, int32_t* out_h,
                            int32_t* out_ncomp) {
    using namespace ljpeg;
    if (len < 4 || buf[0] != 0xFF || buf[1] != 0xD8) return -1;
    int64_t p = 2;
    int precision = 0, width = 0, height = 0, ncomp = 0;
    int comp_tbl[4] = {0, 0, 0, 0};
    int predictor = 1, pt = 0, restart = 0;
    ljpeg::Huff tables[4];
    int64_t scan_start = -1;

    while (p + 4 <= len) {
        if (buf[p] != 0xFF) { p++; continue; }
        uint8_t m = buf[p + 1];
        p += 2;
        if (m == 0xD8 || m == 0x01 || (m >= 0xD0 && m <= 0xD7)) continue;
        if (p + 2 > len) return -2;
        int seglen = (buf[p] << 8) | buf[p + 1];
        if (m == 0xC3) {                      // SOF3
            precision = buf[p + 2];
            height = (buf[p + 3] << 8) | buf[p + 4];
            width = (buf[p + 5] << 8) | buf[p + 6];
            ncomp = buf[p + 7];
            if (ncomp < 1 || ncomp > 4) return -3;
        } else if (m == 0xC4) {               // DHT
            int64_t q = p + 2;
            while (q + 17 <= p + seglen) {
                int th = buf[q] & 0x0F;
                const uint8_t* counts = buf + q + 1;
                int total = 0;
                for (int i = 0; i < 16; i++) total += counts[i];
                if (th < 4 && total <= 256)
                    tables[th].build(counts, buf + q + 17, total);
                q += 17 + total;
            }
        } else if (m == 0xDD) {               // DRI
            restart = (buf[p + 2] << 8) | buf[p + 3];
        } else if (m == 0xDA) {               // SOS
            int ns = buf[p + 2];
            int64_t q = p + 3;
            for (int i = 0; i < ns && i < 4; i++) {
                comp_tbl[i] = (buf[q + 1] >> 4) & 0x0F;
                q += 2;
            }
            predictor = buf[q];
            pt = buf[q + 2] & 0x0F;
            scan_start = p + seglen;
            break;
        }
        p += seglen;
    }
    if (scan_start < 0 || width <= 0 || height <= 0 || precision < 2)
        return -4;
    int64_t rowlen = (int64_t)width * ncomp;
    if ((int64_t)height * rowlen > out_cap) return -5;
    *out_w = width; *out_h = height; *out_ncomp = ncomp;

    ljpeg::BitReader br(buf + scan_start, len - scan_start);
    std::vector<int> prev_row(rowlen, 0), cur_row(rowlen, 0);
    const int default_pred = 1 << (precision - pt - 1);
    bool fresh = true;           // scan start or just after a restart
    int64_t mcu = 0;
    for (int y = 0; y < height; y++) {
        bool row_fresh = (y == 0);
        for (int x = 0; x < width; x++) {
            for (int c = 0; c < ncomp; c++) {
                const ljpeg::Huff& H = tables[comp_tbl[c]];
                if (!H.ok) return -6;
                int t = H.decode(br);
                if (t < 0) return -7;
                int diff = extend(t == 16 ? 0 : br.get(t), t);
                int64_t i = (int64_t)x * ncomp + c;
                int pred;
                if (fresh)
                    pred = default_pred;
                else if (x == 0)
                    pred = prev_row[i];
                else if (row_fresh)
                    pred = cur_row[i - ncomp];
                else {
                    int ra = cur_row[i - ncomp];
                    int rb = prev_row[i];
                    int rc = prev_row[i - ncomp];
                    switch (predictor) {
                        case 1: pred = ra; break;
                        case 2: pred = rb; break;
                        case 3: pred = rc; break;
                        case 4: pred = ra + rb - rc; break;
                        case 5: pred = ra + ((rb - rc) >> 1); break;
                        case 6: pred = rb + ((ra - rc) >> 1); break;
                        case 7: pred = (ra + rb) >> 1; break;
                        default: pred = ra; break;
                    }
                }
                int v = (pred + diff) & 0xFFFF;
                cur_row[i] = v;
                out[(int64_t)y * rowlen + i] = (uint16_t)(v << pt);
            }
            fresh = false;
            mcu++;
            if (restart && (mcu % restart) == 0
                && !(y == height - 1 && x == width - 1)) {
                br.restart_align();
                fresh = true;            // predictor restarts from default
            }
        }
        std::swap(prev_row, cur_row);
    }
    return 0;
}

// ===========================================================================
// Nikon-compressed NEF (compression 34713) — Huffman-coded row-predictor
// deltas with a linearization curve (reference reaches this through
// libraw; original implementation of the format: fixed per-mode Huffman
// tables, two-predictor recurrence, optional tree switch at `split`).
// The curve lookup happens in Python (vectorized); this decodes the
// pre-curve 14-bit values.
// ===========================================================================

namespace nikon {

// Fixed NEF Huffman tables (format constants): 16 code-length counts
// followed by leaf values; leaf = (shl << 4) | len.
static const uint8_t TREES[6][32] = {
    {0, 1, 5, 1, 1, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0, 0,            // 12-bit lossy
     5, 4, 3, 6, 2, 7, 1, 0, 8, 9, 11, 10, 12},
    {0, 1, 5, 1, 1, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0, 0,            // 12-bit lossy after split
     0x39, 0x5a, 0x38, 0x27, 0x16, 5, 4, 3, 2, 1, 0, 11, 12, 12},
    {0, 1, 4, 2, 3, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0,            // 12-bit lossless
     5, 4, 6, 3, 7, 2, 8, 1, 9, 0, 10, 11, 12},
    {0, 1, 4, 3, 1, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0, 0,            // 14-bit lossy
     5, 6, 4, 7, 8, 3, 9, 2, 1, 0, 10, 11, 12, 13, 14},
    {0, 1, 5, 1, 1, 1, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0,            // 14-bit lossy after split
     8, 0x5c, 0x4b, 0x3a, 0x29, 7, 6, 5, 4, 3, 2, 1, 0, 13, 14},
    {0, 1, 4, 2, 2, 3, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0,            // 14-bit lossless
     7, 6, 8, 5, 9, 4, 10, 3, 11, 12, 2, 0, 1, 13, 14}};

struct Bits {                     // MSB-first, no marker stuffing
    const uint8_t* d;
    int64_t n, pos;
    uint32_t acc;
    int bits;
    Bits(const uint8_t* d_, int64_t n_)
        : d(d_), n(n_), pos(0), acc(0), bits(0) {}
    int get1() {
        if (bits == 0) {
            acc = pos < n ? d[pos++] : 0;
            bits = 8;
        }
        bits--;
        return (acc >> bits) & 1;
    }
    int get(int nb) {
        int v = 0;
        for (int i = 0; i < nb; i++) v = (v << 1) | get1();
        return v;
    }
};

}  // namespace nikon

// Decode a Nikon-compressed raw strip into pre-curve values.
// vpred_in: 4 initial vertical predictors (row0col0,row0col1,row1col0,
// row1col1); split: row where the tree switches to tree_id+1 (0 = never).
extern "C" int decode_nikon(const uint8_t* buf, int64_t len,
                            int32_t width, int32_t height,
                            int32_t tree_id, const uint16_t* vpred_in,
                            int32_t split, uint16_t* out) {
    using namespace nikon;
    if (tree_id < 0 || tree_id > 5 || width <= 0 || height <= 0)
        return -1;
    ljpeg::Huff huff[2];
    huff[0].build(TREES[tree_id], TREES[tree_id] + 16, 16);
    if (split > 0) {
        if (tree_id + 1 > 5) return -1;
        huff[1].build(TREES[tree_id + 1], TREES[tree_id + 1] + 16, 16);
    }
    const ljpeg::Huff* H = &huff[0];
    Bits br(buf, len);
    uint16_t vpred[2][2] = {{vpred_in[0], vpred_in[1]},
                            {vpred_in[2], vpred_in[3]}};
    for (int32_t row = 0; row < height; row++) {
        if (split > 0 && row == split) H = &huff[1];
        uint16_t hpred[2] = {0, 0};
        for (int32_t col = 0; col < width; col++) {
            int leaf;
            {   // canonical-huffman decode (reuses ljpeg::Huff layout)
                int code = 0, l;
                leaf = -1;
                for (l = 1; l <= 16; l++) {
                    code = (code << 1) | br.get1();
                    if (H->maxcode[l] >= 0 && code <= H->maxcode[l]) {
                        leaf = H->vals[H->valptr[l] + code - H->mincode[l]];
                        break;
                    }
                }
                if (leaf < 0) return -2;
            }
            int lenb = leaf & 15;
            int shl = leaf >> 4;
            int diff = ((br.get(lenb - shl) << 1) + 1) << shl >> 1;
            if (lenb > 0 && (diff & (1 << (lenb - 1))) == 0)
                diff -= (1 << lenb) - (shl ? 0 : 1);
            if (col < 2)
                hpred[col] = vpred[row & 1][col] =
                    (uint16_t)(vpred[row & 1][col] + diff);
            else
                hpred[col & 1] = (uint16_t)(hpred[col & 1] + diff);
            int16_t v = (int16_t)hpred[col & 1];
            int clipped = v < 0 ? 0 : (v > 0x3fff ? 0x3fff : v);
            out[(int64_t)row * width + col] = (uint16_t)clipped;
        }
    }
    return 0;
}

// ---------------------------------------------------------------------------
// Panasonic RW2 v4 bitstream (dcraw panasonic_load_raw / pana_bits
// semantics — the documented 12-bit sliced predictor format; the
// reference reads RW2 through libraw, image_formats_libraries.c)
// ---------------------------------------------------------------------------

namespace pana {

struct Bits {
    const uint8_t* data;
    int64_t len, pos;
    int load_flags;
    // 0x4002: byte = vbits>>3 ^ 0x3ff0 reaches 0x3fff at every 16 KB
    // block boundary and the 16-bit read there touches buf[0x4000];
    // the pad bytes stay zero (matching the Python oracle)
    uint8_t buf[0x4002];
    int vbits;

    Bits(const uint8_t* d, int64_t l, int lf)
        : data(d), len(l), pos(0), load_flags(lf), vbits(0) {
        buf[0x4000] = buf[0x4001] = 0;
    }

    void fill(uint8_t* dst, int64_t n) {
        for (int64_t i = 0; i < n; i++)
            dst[i] = pos < len ? data[pos++] : 0;
    }

    unsigned get(int nbits) {
        if (!vbits) {
            fill(buf + load_flags, 0x4000 - load_flags);
            fill(buf, load_flags);
        }
        vbits = (vbits - nbits) & 0x1ffff;
        int byte = (vbits >> 3) ^ 0x3ff0;
        return ((buf[byte] | (buf[byte + 1] << 8)) >> (vbits & 7))
               & ~((-1) << nbits);
    }
};

}  // namespace pana

extern "C" int decode_panasonic(const uint8_t* buf, int64_t len,
                                int32_t width, int32_t height,
                                int32_t load_flags, uint16_t* out) {
    pana::Bits bits(buf, len, load_flags);
    int pred[2], nonz[2], sh = 0;
    for (int32_t row = 0; row < height; row++) {
        for (int32_t col = 0; col < width; col++) {
            int i = col % 14;
            if (i == 0) pred[0] = pred[1] = nonz[0] = nonz[1] = 0;
            if (i % 3 == 2) sh = 4 >> (3 - (int)bits.get(2));
            if (nonz[i & 1]) {
                int j = (int)bits.get(8);
                if (j) {
                    if ((pred[i & 1] -= 0x80 << sh) < 0 || sh == 4)
                        pred[i & 1] &= ~((-1) << sh);
                    pred[i & 1] += j << sh;
                }
            } else if ((nonz[i & 1] = (int)bits.get(8)) != 0 || i > 11) {
                pred[i & 1] = nonz[i & 1] << 4 | (int)bits.get(4);
            }
            out[(int64_t)row * width + col] = (uint16_t)pred[col & 1];
        }
    }
    return 0;
}
